#!/usr/bin/env python
"""Headline benchmark: Llama-2-7B-shape Q4_0 decode vs the HBM roofline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline compares against the reference's published decode rate
(zgml tg200 ~208 tok/s on Apple Silicon, docs/perf-targets.md:13 — see
BASELINE.md); `roofline_frac` is the north-star gate: achieved / achievable
tok/s where achievable = measured HBM bandwidth / bytes-per-token
(BASELINE.md: >= 0.90 target). Secondary numbers (prefill, placement profile,
roofline breakdown) go to stderr.

Models are synthetic (zero-egress environment) but have exactly the real
models' shapes and quantization formats. Decode is measured llama.cpp-style:
bs=1, greedy.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_model(path: str, cfg, quant):
    from zgml_tpu.utils.synthetic import write_synthetic_llama_gguf
    if not os.path.exists(path):
        t0 = time.time()
        log(f"writing synthetic model {path} ...")
        write_synthetic_llama_gguf(path, cfg, quant, seed=0)
        log(f"  wrote in {time.time()-t0:.1f}s")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama2-7b",
                    choices=["smollm", "tinyllama", "llama2-7b", "llama3-8b", "tiny"])
    ap.add_argument("--quant", default=None, choices=["q8_0", "q4_0"],
                    help="default: q4_0 for llama2-7b/llama3-8b/tinyllama, "
                         "q8_0 otherwise")
    ap.add_argument("--pp", type=int, default=128, help="prefill tokens")
    ap.add_argument("--tg", type=int, default=None, help="decode tokens "
                    "(default 128 for 7b, 200 otherwise)")
    ap.add_argument("--smoke", action="store_true", help="tiny fast run")
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help="prefill bucket size (0 = auto: min(pp, 256); "
                         "larger chunks amortize the per-K-step VPU dequant "
                         "over more rows -> higher prefill MFU)")
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8"],
                    help="KV cache dtype")
    ap.add_argument("--kernel-profile", action="store_true",
                    help="per-kernel device timing at model shapes (stderr)")
    ap.add_argument("--conformance", action="store_true",
                    help="run the pallas-vs-oracle conformance sweep at "
                         "model dims on THIS backend before benching")
    args = ap.parse_args()

    import dataclasses
    import jax
    from zgml_tpu.io.gguf import GGMLType
    from zgml_tpu.io.llama_loader import load_llama
    from zgml_tpu.runtime.engine import LlamaEngine
    from zgml_tpu.runtime.profile import global_profile
    from zgml_tpu.utils import synthetic

    log(f"devices: {jax.devices()}")
    from zgml_tpu import config as zcfg_hdr
    log(f"config: {zcfg_hdr.snapshot()}")
    if args.smoke:
        args.preset, args.pp, args.tg = "tiny", 16, 8

    if args.quant is None:
        args.quant = ("q4_0" if args.preset in ("llama2-7b", "llama3-8b", "tinyllama") else "q8_0")
    if args.tg is None:
        args.tg = 128 if args.preset in ("llama2-7b", "llama3-8b") else 200

    if args.preset == "smollm":
        cfg = dataclasses.replace(synthetic.SMOLLM_135M, tied_lm_head=False,
                                  max_seq_len=2048)
    elif args.preset == "tinyllama":
        cfg = dataclasses.replace(synthetic.TINYLLAMA_1_1B, max_seq_len=2048)
    elif args.preset == "llama2-7b":
        cfg = dataclasses.replace(synthetic.LLAMA2_7B, max_seq_len=2048)
    elif args.preset == "llama3-8b":
        cfg = dataclasses.replace(synthetic.LLAMA3_8B, max_seq_len=4096)
    else:
        cfg = synthetic.TINY_TEST
    quant = GGMLType.Q8_0 if args.quant == "q8_0" else GGMLType.Q4_0

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{args.preset}_{args.quant}.gguf")
    build_model(path, cfg, quant)

    t0 = time.time()
    packed = path + ".packed.safetensors"
    if os.path.exists(packed):
        from zgml_tpu.io.packed_ckpt import load_packed_llama
        # planar-only load: the derived decode views re-derive ON DEVICE
        # below (attach_derived), halving the host->device upload
        model = load_packed_llama(packed, derive=False)
        how = "mmap-loaded packed ckpt"
    else:
        model, _ = load_llama(path, mode="quantized")
        from zgml_tpu.io.packed_ckpt import save_packed_llama
        save_packed_llama(packed, model)
        how = "loaded+repacked (cached for next run)"
    from zgml_tpu import config as zconfig
    # tape/stack BEFORE device_put: building from jax-array leaves would
    # round-trip the 4.2GB weights through the host over the tunnel
    if zconfig.tape_decode() and "layers_tape" in model.params:
        how += " +tape-decode megacall (mmap)"
    elif zconfig.tape_decode() and model.enable_tape_decode():
        how += " +tape-decode megacall (built; cached for next run)"
        from zgml_tpu.io.packed_ckpt import save_packed_llama
        save_packed_llama(packed, model)    # persist the tape: mmap next time
    elif zconfig.stack_decode() and model.enable_stacked_decode():
        how += " +stacked-decode megacall"
    model.params = jax.device_put(model.params)
    model.attach_derived()
    log(f"{how} in {time.time()-t0:.1f}s "
        f"(cfg: d={cfg.d_model} L={cfg.n_layers} heads={cfg.n_heads}/"
        f"{cfg.n_kv_heads} ff={cfg.d_ff} vocab={cfg.vocab_size})")

    import jax.numpy as jnp
    conf_pass = conf_total = None
    if args.conformance:
        from zgml_tpu.runtime.conformance import render, run_conformance
        conf = run_conformance(cfg, kv_len=min(192, cfg.max_seq_len - 130))
        log(render(conf))
        conf_pass = sum(r["ok"] for r in conf)
        conf_total = len(conf)
    if args.kernel_profile:
        from zgml_tpu.runtime.ktime import (profile_decode_kernels,
                                            render_kernel_profile)
        kv_mid_kp = args.pp + (args.tg or 128) // 2
        log(render_kernel_profile(
            profile_decode_kernels(model, kv_len=min(kv_mid_kp,
                                                     cfg.max_seq_len - 1))))
    cache_dtype = "int8" if args.kv == "int8" else jnp.bfloat16
    chunk = args.prefill_chunk or min(args.pp, 256)
    eng = LlamaEngine(model, batch=1, prefill_chunk=chunk,
                      cache_dtype=cache_dtype)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, args.pp).astype(np.int32)

    # 64-token bursts: 32 -> 64 measured 7.81 -> 7.70 ms/token at 7B (the
    # per-dispatch tunnel cost amortizes over more on-device iterations)
    scan_chunk = max(8, min(64, args.tg // 2))

    # -- warmup (compiles prefill + decode plans) ----------------------------
    t0 = time.time()
    eng.prefill(prompt)
    tok, _ = eng.step(np.array([1]))
    for _ in range(2):
        tok, _ = eng.step(tok)
    toks = eng.decode_n(tok, scan_chunk)
    _ = int(np.asarray(toks[-1])[0])
    log(f"warmup/compile in {time.time()-t0:.1f}s")

    # The chip is time-shared behind the axon tunnel and throughput varies
    # run-to-run; like llama-bench, take the best of N trials (approximates
    # unloaded performance; stderr shows all trials).
    trials = 1 if args.smoke else 4

    def best_of(fn, n=trials):
        rates = [fn() for _ in range(n)]
        log(f"    trials: {['%.1f' % r for r in rates]}")
        return max(rates)

    def run_prefill(reps: int = 8):
        # dispatch-chain `reps` full prefills (cache-carried dependency) and
        # fetch once: amortizes the ~30ms tunnel RTT that a single call pays
        eng.reset()
        t0 = time.time()
        last = None
        for _ in range(reps):
            eng.reset()
            last = eng.prefill(prompt)
        _ = float(np.asarray(last[:, 0])[0])  # value fetch = true barrier
        return args.pp * reps / (time.time() - t0)

    def run_decode_steps():
        eng.reset()
        eng.prefill(prompt)
        tok, _ = eng.step(np.array([1]))
        n_sync = min(args.tg, 64)
        t0 = time.time()
        for _ in range(n_sync):
            tok, _ = eng.step(tok)
        _ = int(np.asarray(tok)[0])
        return n_sync / (time.time() - t0)

    def run_decode_scan(reps: int = 2):
        # `reps` full tg-token generations chained back-to-back, one fetch:
        # amortizes the tunnel RTT below ~4% of the measurement
        eng.reset()
        eng.prefill(prompt)
        tok, _ = eng.step(np.array([1]))
        t0 = time.time()
        for _ in range(reps):
            eng.reset()
            eng.pos = len(prompt) + 1   # decode from the post-prompt position
            done = 0
            while done < args.tg:
                n = min(scan_chunk, args.tg - done)
                toks = eng.decode_n(tok, n)
                tok = toks[-1]
                done += n
        _ = int(np.asarray(tok)[0])
        return args.tg * reps / (time.time() - t0)

    pp_rate = best_of(run_prefill)

    # pp512 bucket (BASELINE 1B-class acceptance shape): chunk=512 amortizes
    # the per-K-step dequant over 4x the rows (52% -> 60% MFU measured at 7B)
    pp512_rate = None
    if not args.smoke and cfg.max_seq_len >= 512 + args.tg + 2:
        prompt512 = rng.integers(0, cfg.vocab_size, 512).astype(np.int32)
        eng512 = LlamaEngine(model, batch=1, prefill_chunk=512)
        eng512.prefill(prompt512)        # compile

        def run_prefill512(reps: int = 4):
            eng512.reset()
            t0 = time.time()
            last = None
            for _ in range(reps):
                eng512.reset()
                last = eng512.prefill(prompt512)
            _ = float(np.asarray(last[:, 0])[0])
            return 512 * reps / (time.time() - t0)

        pp512_rate = best_of(run_prefill512)
        del eng512

    step_rate = best_of(run_decode_steps)
    tg_rate = max(best_of(run_decode_scan), step_rate)

    # prefill MFU: matmul FLOPs/token from the model dims vs v5e bf16 peak
    hd = cfg.d_model // cfg.n_heads
    mm = cfg.n_layers * (cfg.d_model * (cfg.n_heads + 2 * cfg.n_kv_heads) * hd
                         + cfg.n_heads * hd * cfg.d_model
                         + 3 * cfg.d_model * cfg.d_ff)
    mm += cfg.d_model * cfg.vocab_size
    attn_fl = cfg.n_layers * 2 * cfg.n_heads * hd * (args.pp / 2)  # per token
    flops_tok = 2 * mm + 2 * attn_fl
    mfu = pp_rate * flops_tok / 197e12           # v5e bf16 peak ~197 TFLOP/s
    pp512_txt = ""
    if pp512_rate:
        fl512 = 2 * mm + 2 * cfg.n_layers * 2 * cfg.n_heads * hd * 256
        pp512_txt = (f"   pp512: {pp512_rate:.1f} tok/s "
                     f"(MFU {100 * pp512_rate * fl512 / 197e12:.1f}%)")
    log(f"pp{args.pp}: {pp_rate:.1f} tok/s (chunk={chunk}, "
        f"{pp_rate*flops_tok/1e12:.1f} TF/s, MFU {100*mfu:.1f}%)"
        f"{pp512_txt}   tg{args.tg}: {tg_rate:.1f} tok/s "
        f"(best; scan chunk={scan_chunk}); per-step-sync: {step_rate:.1f} tok/s")
    log(global_profile.render())

    # -- HBM roofline (north-star gate, BASELINE.md) --------------------------
    from zgml_tpu.runtime import roofline as rl
    kv_mid = args.pp + args.tg // 2      # average live context while decoding
    roof = rl.roofline(model, kv_mid, cache_dtype=cache_dtype)
    roof_frac = tg_rate / roof["achievable_tok_s"]
    log(f"roofline: HBM {roof['hbm_bandwidth_GBs']:.0f} GB/s measured; "
        f"{roof['weight_bytes']/1e9:.3f} GB weights + "
        f"{roof['kv_bytes']/1e6:.1f} MB KV per token @ kv_len={kv_mid} "
        f"-> achievable {roof['achievable_tok_s']:.1f} tok/s; "
        f"achieved {tg_rate:.1f} ({100*roof_frac:.1f}%)")

    # -- memory acceptance (ref perf-targets.md:226-230: memory <= 115%) -----
    peak_hbm = model_bytes = mem_frac = None
    mem_src = "memory_stats"
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_hbm = int(stats.get("peak_bytes_in_use",
                                 stats.get("bytes_in_use", 0)))
        if peak_hbm <= 0:
            # the tunneled axon platform exposes memory_stats but reports
            # zeros — fall back to XLA's per-executable accounting:
            # memory_analysis() on the compiled decode + prefill plans gives
            # argument/output/temp/alias bytes; peak ~= max over executables
            # of (arguments + outputs - donation aliases + temps + code)
            mem_src = "memory_analysis"
            import jax.numpy as _jnp

            def _exe_bytes(lowered):
                ma = lowered.compile().memory_analysis()
                get = lambda n: int(getattr(ma, n, 0) or 0)  # noqa: E731
                return (get("argument_size_in_bytes")
                        + get("output_size_in_bytes")
                        - get("alias_size_in_bytes")
                        + get("temp_size_in_bytes")
                        + get("generated_code_size_in_bytes"))

            tok = _jnp.zeros((1, 1), _jnp.int32)
            win = _jnp.zeros((1, chunk), _jnp.int32)
            d_low = eng._decode_step.lower(model.params, tok, eng.cache, 0,
                                           jax.random.PRNGKey(0))
            p_low = eng._prefill_chunk.lower(model.params, win, eng.cache,
                                             0, chunk)
            peak_hbm = max(_exe_bytes(d_low), _exe_bytes(p_low))
        if peak_hbm <= 0:
            peak_hbm = mem_frac = None
            log("memory: peak HBM unavailable on this backend")
        else:
            # memory contract denominator = RESIDENT model bytes (planar
            # weights + the derived decode views: prefill reads planar,
            # decode reads the views, so both legitimately live in HBM) —
            # unlike the roofline's per-token STREAMED bytes, which counts
            # one copy per projection
            model_bytes = int(sum(
                getattr(leaf, "nbytes", 0) if not hasattr(leaf, "shape")
                else int(np.prod(leaf.shape)) * leaf.dtype.itemsize
                for leaf in jax.tree.leaves(model.params)))
            cache_bytes = sum(int(np.prod(c.shape)) * c.dtype.itemsize
                              for c in jax.tree.leaves(eng.cache))
            budget = 1.15 * (model_bytes + cache_bytes)
            mem_frac = peak_hbm / budget if budget else None
            # the reference's <=115% contract targets 1B-class models
            # (perf-targets.md:226-230); below ~0.4 GB the fixed XLA
            # workspace/logits buffers dominate and the ratio is meaningless
            if mem_frac <= 1.0:
                verdict = "ok"
            elif model_bytes < 0.4e9:
                verdict = "contract applies at >=1B scale; informational"
            else:
                verdict = "OVER the 115% contract"
            log(f"memory: peak HBM {peak_hbm/1e9:.2f} GB ({mem_src}) vs "
                f"model {model_bytes/1e9:.2f} GB + cache "
                f"{cache_bytes/1e9:.2f} GB; peak/(1.15x model+cache) = "
                f"{mem_frac:.2f} ({verdict})")
    except Exception as e:          # memory_stats absent on some backends
        log(f"memory stats unavailable: {e}")

    # vs_baseline semantics: the reference's only absolute decode number is
    # SmolLM-135M on Apple Silicon (208 tok/s, BASELINE.md) — only comparable
    # for the smollm preset. For 1B/7B shapes the BASELINE gate is the HBM
    # roofline (>=90%), so vs_baseline = roofline_frac / 0.90 (1.0 = gate met).
    if args.preset == "smollm":
        vs_baseline = tg_rate / 208.0
    else:
        vs_baseline = roof_frac / 0.90
    name = {"smollm": "SmolLM-135M", "tinyllama": "TinyLlama-1.1B",
            "llama2-7b": "Llama-2-7B", "llama3-8b": "Llama-3-8B",
            "tiny": "tiny"}[args.preset]
    print(json.dumps({
        "metric": f"decode tok/s ({name}-shape {args.quant.upper()}, bs=1, tg{args.tg})",
        "value": round(tg_rate, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs_baseline, 3),
        "roofline_frac": round(roof_frac, 3),
        "roofline_tok_s": round(roof["achievable_tok_s"], 1),
        "hbm_GBs": round(roof["hbm_bandwidth_GBs"], 1),
        "prefill_tok_s": round(pp_rate, 1),
        **({"prefill512_tok_s": round(pp512_rate, 1)} if pp512_rate else {}),
        **({"peak_hbm_bytes": peak_hbm, "mem_frac_of_115pct": round(mem_frac, 3)}
           if mem_frac is not None else {}),
        **({"conformance_pass": conf_pass, "conformance_total": conf_total}
           if conf_total is not None else {}),
    }))


if __name__ == "__main__":
    main()
