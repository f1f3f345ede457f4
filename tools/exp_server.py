"""Persistent-model experiment server: load the 7B packed checkpoint ONCE
(the ~5-minute tunnel upload), then execute experiment snippets submitted as
files — the working substitute for an interactive TPU REPL when no terminal
multiplexer is available.

Protocol:
  inbox:  /tmp/zgml_exp/in/<name>.py     (exec'd in the server namespace,
                                          sorted order, each file once)
  result: /tmp/zgml_exp/out/<name>.out   (stdout+stderr+traceback)
  marker: /tmp/zgml_exp/out/<name>.done
  stop:   /tmp/zgml_exp/in/STOP

Namespace exposed to snippets: model, cfg, jax, jnp, np, os, time,
time_call, time_ab, load path constants. Snippets may mutate env toggles;
they run sequentially in submission order.

Usage: python tools/exp_server.py [packed.safetensors]
"""
from __future__ import annotations

import io
import contextlib
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IN = "/tmp/zgml_exp/in"
OUT = "/tmp/zgml_exp/out"
os.makedirs(IN, exist_ok=True)
os.makedirs(OUT, exist_ok=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zgml_tpu.io.packed_ckpt import load_packed_llama
    from zgml_tpu.runtime.ktime import time_ab, time_call

    path = sys.argv[1] if len(sys.argv) > 1 else \
        ".bench_cache/llama2-7b_q4_0.gguf.packed.safetensors"
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    model = load_packed_llama(path, derive=False)
    model.params = jax.device_put(model.params)
    model.attach_derived()
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    print(f"loaded+uploaded in {time.time()-t0:.1f}s", flush=True)
    ns = dict(model=model, cfg=model.cfg, jax=jax, jnp=jnp, np=np, os=os,
              time=time, time_call=time_call, time_ab=time_ab, path=path)

    done = set(os.listdir(OUT))
    print("ready", flush=True)
    while True:
        if os.path.exists(os.path.join(IN, "STOP")):
            print("stopping", flush=True)
            return
        jobs = sorted(f for f in os.listdir(IN)
                      if f.endswith(".py") and f + ".done" not in done
                      and not os.path.exists(os.path.join(OUT, f + ".done")))
        if not jobs:
            time.sleep(1.0)
            continue
        name = jobs[0]
        src = open(os.path.join(IN, name)).read()
        buf = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf), \
                    contextlib.redirect_stderr(buf):
                exec(compile(src, name, "exec"), ns)
        except BaseException:
            buf.write(traceback.format_exc())
        buf.write(f"\n[{name}: {time.time()-t0:.1f}s]\n")
        with open(os.path.join(OUT, name + ".out"), "w") as f:
            f.write(buf.getvalue())
        open(os.path.join(OUT, name + ".done"), "w").close()
        done.add(name + ".done")
        print(f"done {name} ({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
