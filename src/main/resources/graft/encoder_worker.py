#!/usr/bin/env python3
"""Reference encoder worker for graft's Embed.ProcessEncoder seam.

This is the worked example of the production embedding path: the model
runs OUTSIDE the JVM, one worker process per Spark partition, batched
over a line protocol (see operators/Embed.scala ProcessEncoder):

  request:  one line "<n>", then n lines of base64(UTF-8 text)
            (base64 framing -- raw text could contain newlines);
  response: n lines, each one embedding as space-separated floats.

When sentence-transformers is installed (the reference stack:
demo.ipynb cell 7, all-MiniLM-L6-v2), the real model answers.
Otherwise a deterministic 64-dim hashed projection stands in so the
pipeline runs end-to-end anywhere -- same protocol, same shapes.
Swap load_model() for any CLI-reachable model (ONNX runtime, llama.cpp
embedding mode, a TEI server client ...) without touching the JVM side.
"""
import base64
import hashlib
import math
import sys


def load_model():
    try:
        from sentence_transformers import SentenceTransformer
        model = SentenceTransformer("all-MiniLM-L6-v2")

        def encode(texts):
            return [[float(x) for x in v]
                    for v in model.encode(texts, normalize_embeddings=True)]
        return encode
    except Exception:
        def encode(texts):
            out = []
            for t in texts:
                v = [0.0] * 64
                for tok in t.lower().split():
                    h = int.from_bytes(
                        hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                    sign = 1.0 if (h >> 63) == 0 else -1.0
                    v[h % 64] += sign
                norm = math.sqrt(sum(x * x for x in v)) or 1.0
                out.append([x / norm for x in v])
            return out
        return encode


def main():
    encode = load_model()
    while True:
        line = sys.stdin.readline()
        if not line:
            break
        n = int(line)
        texts = [base64.b64decode(sys.stdin.readline().strip()).decode("utf-8")
                 for _ in range(n)]
        for v in encode(texts):
            sys.stdout.write(" ".join(repr(x) for x in v) + "\n")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
