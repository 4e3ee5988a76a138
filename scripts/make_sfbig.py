"""Generate a measurement-only scaled dataset (default 10x sf0.1 ~ sf1.0).

The driver's own large-SF data is generated at measurement time and not
kept on disk; this reproduces the same scaling rules observed between
sf0.01 and sf0.1 (TESTDATA.md): every entity count scales linearly
(customers, orders, lineitem, parts, suppliers, docs, embeddings, event
users), time ranges and the 31-word document vocabulary stay constant.
Copies get disjoint key ranges (FK-consistent offsets) so join
cardinalities scale like the driver's generator; texts are per-copy word
permutations so the distinct-text ratio stays ~1, with the same planted
"dup" rows duplicated inside each copy.

NOT part of any query path or the frozen bench — measurement harness
only (guide section 1).

Usage: python scripts/make_sfbig.py [out_dir] [n_copies]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig/sf1.0"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os

    os.makedirs(out, exist_ok=True)

    def read(t):
        return pq.read_table(f"{SRC}/{t}.parquet")

    def write(t, tbl):
        pq.write_table(tbl, f"{out}/{t}.parquet")
        print(t, tbl.num_rows)

    # Tiny dims: keep as-is (region/nation are fixed-size in TPC-H too).
    for t in ("region", "nation"):
        write(t, read(t))

    def offset_copies(tbl, key_offsets, mutate=None):
        """n copies with each key column offset by copy_i * (max+1)."""
        parts = []
        maxes = {k: pc.max(tbl[k]).as_py() + 1 for k in key_offsets}
        for i in range(n):
            t = tbl
            for k in key_offsets:
                t = t.set_column(
                    t.schema.get_field_index(k), k,
                    pc.add(t[k], i * maxes[k]))
            if mutate is not None:
                t = mutate(t, i)
            parts.append(t)
        return pa.concat_tables(parts)

    # nationkeys stay in the fixed region/nation range — only entity keys shift
    write("supplier", offset_copies(read("supplier"), ["s_suppkey"]))
    write("customer", offset_copies(read("customer"), ["c_custkey"]))
    write("part", offset_copies(read("part"), ["p_partkey"]))
    write("orders", offset_copies(read("orders"), ["o_orderkey", "o_custkey"]))
    write("lineitem", offset_copies(
        read("lineitem"), ["l_orderkey", "l_partkey", "l_suppkey"]))
    write("events", offset_copies(read("events"), ["event_id", "user_id"]))

    rng = np.random.default_rng(42)

    # Per-copy VOCABULARY permutation: word w -> perm_i(w). An in-place
    # rotation of the word list would preserve each doc's token multiset
    # (and therefore its simhash/minhash/shingle sets), planting
    # artificial 10-doc near-dup cliques the driver's generator does not
    # have; substituting words decorrelates copies while keeping every
    # intra-copy property (lengths, dup rows, per-doc repetition) exact.
    vocab = sorted({w for s in read("documents")["text"].to_pylist()
                    for w in s.split(" ")})

    def mutate_docs(t, i):
        if i == 0:
            return t
        perm = rng.permutation(len(vocab))
        m = {w: vocab[perm[j]] for j, w in enumerate(vocab)}
        out_texts = [" ".join(m[w] for w in s.split(" "))
                     for s in t["text"].to_pylist()]
        return t.set_column(
            t.schema.get_field_index("text"), "text",
            pa.array(out_texts, type=pa.string()))

    write("documents", offset_copies(read("documents"), ["doc_id"], mutate_docs))

    def mutate_emb(t, i):
        # Per-copy ORTHOGONAL transform (dim permutation + sign flips):
        # intra-copy geometry (norms, all pairwise cosines, label
        # clusters) is preserved exactly, cross-copy similarity is
        # randomized — additive noise would leave every copy a
        # near-duplicate of the original and blow up the near-dup pair
        # counts 100x vs the driver's independent draws.
        if i == 0:
            return t
        emb = t["embedding"].combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False).copy()
        dim = 64
        vals = vals.reshape(-1, dim)
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        vals = (vals[:, perm] * signs).astype(np.float32).reshape(-1)
        new = pa.ListArray.from_arrays(emb.offsets, pa.array(vals, type=pa.float32()))
        return t.set_column(t.schema.get_field_index("embedding"), "embedding", new)

    write("embeddings", offset_copies(read("embeddings"), ["vec_id"], mutate_emb))
    open(f"{out}/_DONE", "w").close()


if __name__ == "__main__":
    main()
