"""Compile-level probe of the warehouse-scale k-NN program (no execution).

The 1M x 1M self-search OOMed at [Q=131072, block=8192]: XLA materialized
full sort temps for lax.top_k plus our (since removed) [Q, block] iota.
This probe AOT-compiles `_knn_search` at candidate (Q_chunk, block) points
against a 1M x 768 corpus and prints each program's HLO temp/argument
memory and whether top_k lowered to a whole-row sort — picking the
operating point from the compiler's own memory analysis instead of
guessing. Compile-only: safe to run alongside nothing else; each compile
is seconds through the relay at this graph size.

Run: python benchmarks/knn_memory_probe.py [n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=1_000_000):
    import jax
    import jax.numpy as jnp
    from multimodalsimilar_tpu.retrieval import knn

    d, k = 768, 128
    n_pad = n + (-n) % 32768
    for q in (131072, 65536, 32768):
        for block in (32768, 16384, 8192, 4096):
            corpus = jax.ShapeDtypeStruct((n_pad, d), jnp.float32)
            queries = jax.ShapeDtypeStruct((q, d), jnp.float32)
            true_n = jax.ShapeDtypeStruct((), jnp.int32)
            merge_every = knn._plan_merge_every(q, k, block)
            try:
                lowered = knn._knn_search.lower(
                    corpus, queries, true_n, k, "ip", block)
                compiled = lowered.compile()
                mem = compiled.memory_analysis()
                hlo = compiled.as_text()
                # shape is AFTER '=' ('%sort.5 = f32[16,512]{1,0}
                # sort(...)'); grepping the instruction name counted 0
                # always, defeating the probe's whole-row-sort detection
                full_sorts = sum(
                    1 for line in hlo.splitlines()
                    if " sort(" in line and f"{block}]" in
                    line.split("=", 1)[-1].split("sort(")[0])
                print(json.dumps({
                    "q": q, "block": block, "merge_every": merge_every,
                    "temp_gb": round(mem.temp_size_in_bytes / 2**30, 2),
                    "args_gb": round(
                        mem.argument_size_in_bytes / 2**30, 2),
                    "out_gb": round(mem.output_size_in_bytes / 2**30, 2),
                    "full_row_sorts": full_sorts,
                }), flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(json.dumps({"q": q, "block": block,
                                  "error": msg}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
