"""GPT-2 byte-level BPE tokenizer (ref: src/tokenizer.zig:19-379).

Supports both the HF file pair (vocab.json + merges.txt) and GGUF-embedded vocab
(tokenizer.ggml.tokens / tokenizer.ggml.merges metadata arrays), which the
reference does not handle but llama.cpp does.
"""
from __future__ import annotations

import json
import os


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte<->unicode mapping: printable bytes map to themselves, the rest to
    256+ codepoints (ref: src/tokenizer.zig:179-217)."""
    bs = list(range(ord("!"), ord("~") + 1)) + \
         list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_BYTE_ENCODER = _bytes_to_unicode()
_BYTE_DECODER = {v: k for k, v in _BYTE_ENCODER.items()}


class BPETokenizer:
    """Byte-level BPE with iterative lowest-rank merge (the reference's algorithm,
    tokenizer.zig:238-320)."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 special_tokens: dict[str, int] | None = None):
        self.vocab = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {pair: i for i, pair in enumerate(merges)}
        self.special_tokens = special_tokens or {}
        for tok, tid in self.special_tokens.items():
            self.decoder.setdefault(tid, tok)
        self._cache: dict[str, list[str]] = {}

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_files(cls, vocab_path: str | os.PathLike, merges_path: str | os.PathLike):
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(merges_path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        return cls(vocab, merges)

    @classmethod
    def from_gguf(cls, gf) -> "BPETokenizer":
        """Build from GGUF metadata (llama.cpp convention)."""
        tokens = gf.metadata.get("tokenizer.ggml.tokens")
        if tokens is None:
            raise ValueError("GGUF has no embedded tokenizer")
        vocab = {t: i for i, t in enumerate(tokens)}
        merges_raw = gf.metadata.get("tokenizer.ggml.merges", [])
        merges = []
        for m in merges_raw:
            a, _, b = m.partition(" ")
            merges.append((a, b))
        special = {}
        for key, name in (("tokenizer.ggml.bos_token_id", "<s>"),
                          ("tokenizer.ggml.eos_token_id", "</s>")):
            if key in gf.metadata:
                special[name] = int(gf.metadata[key])
        return cls(vocab, merges, special)

    # -- BPE ----------------------------------------------------------------
    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token)
        while len(word) > 1:
            best, best_rank = None, None
            for i in range(len(word) - 1):
                r = self.bpe_ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            word[best:best + 2] = [word[best] + word[best + 1]]
        self._cache[token] = word
        return word

    def _split_pretok(self, text: str) -> list[str]:
        """GPT-2 pre-tokenizer: split into letter/number/other runs, each optionally
        preceded by a space that attaches to the following run (approximation of the
        GPT-2 regex without the `regex` package, matching the reference's manual
        splitter, tokenizer.zig:238-265)."""
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            j = i
            prefix = ""
            if text[j] == " " and j + 1 < n and not text[j + 1].isspace():
                prefix = " "
                j += 1
            c = text[j]
            if c.isalpha():
                k = j
                while k < n and text[k].isalpha():
                    k += 1
            elif c.isdigit():
                k = j
                while k < n and text[k].isdigit():
                    k += 1
            elif c.isspace():
                k = j
                while k < n and text[k].isspace():
                    k += 1
            else:
                k = j
                while k < n and not (text[k].isalnum() or text[k].isspace()):
                    k += 1
            out.append(prefix + text[j:k])
            i = k
        return out

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for piece in self._split_pretok(text):
            mapped = "".join(_BYTE_ENCODER[b] for b in piece.encode("utf-8"))
            for sub in self._bpe(mapped):
                tid = self.vocab.get(sub)
                if tid is None:
                    # fall back to per-character encoding
                    for ch in sub:
                        cid = self.vocab.get(ch)
                        if cid is not None:
                            ids.append(cid)
                else:
                    ids.append(tid)
        return ids

    def decode(self, ids: list[int]) -> str:
        text = "".join(self.decoder.get(i, "") for i in ids)
        data = bytes(_BYTE_DECODER.get(ch, ord("?") & 0xFF) if ch in _BYTE_DECODER
                     else 0x3F for ch in text)
        return data.decode("utf-8", errors="replace")
