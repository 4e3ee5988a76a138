"""SimHash bucket-cap recall property (VERDICT r03 #5, fixed r05 per
VERDICT r04 #1).

Through round 4 the production ``max_bucket=128`` cap DROPPED pigeonhole
buckets bigger than the cap before the self-join, measuring recall 0.64
on this corpus. Round 5 replaced truncation with a recursive sub-split
(operators/text_dedup.py ``_pigeonhole_value_pairs``): over-cap buckets
re-key their members by 4 child chunks carved from the still-unkeyed
bits (pigeonhole: ≤3 differing bits ⇒ ≥1 clean child), and the final
level joins everything — so candidate generation is COMPLETE and
``max_bucket`` is a pure performance knob.

The planted corpus is the adversarial case the old cap lost on:

- isolated near-dup pairs (a doc + its 1-token-edited twin) live in
  small buckets;
- a low-entropy mega-cluster (400 docs sharing 40 boilerplate tokens)
  overflows every chunk bucket — its intra-cluster pairs were the loss
  (recall 0.64 at cap 128, 1.00 only at 256 > cluster size).

Now: recall must be EXACTLY 1.0 at every cap, including caps far below
the cluster size.
"""

from mediacrawler_spark.operators.text_dedup import simhash_pairs


def _mix(x: int) -> int:
    x = (x ^ (x >> 33)) * 0xFF51AFD7ED558CCD % (1 << 64)
    x = (x ^ (x >> 33)) * 0xC4CEB9FE1A85EC53 % (1 << 64)
    return x ^ (x >> 33)


def _corpus():
    rows = []

    def toks(seed, n, off=0):
        return [f"t{off + _mix(seed * 1000 + i) % 5000}" for i in range(n)]

    boiler = " ".join(f"b{i}" for i in range(40))
    for d in range(200):
        base = toks(d, 30)
        rows.append((f"d{d}", " ".join(base)))
        twin = list(base)
        twin[3] = f"x{d}"
        rows.append((f"d{d}t", " ".join(twin)))
    for d in range(200, 600):
        rows.append((f"d{d}", boiler + " " + " ".join(toks(d, 2, off=90000))))
    return rows


def test_capped_recall_exact_at_every_cap(spark):
    df = spark.createDataFrame(_corpus(), "doc_id string, text string")
    truth = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(df, max_bucket=1 << 20).collect()
    }
    twin_truth = {p for p in truth if p[1] == p[0] + "t"}
    assert len(twin_truth) >= 50, "planted twins must be hamming≤3 near-dups"
    assert len(truth) > 10_000, "mega-cluster must dominate the truth set"

    for cap in (16, 32, 128):
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(df, max_bucket=cap).collect()
        }
        # sub-split never invents pairs (verify stage is exact) ...
        assert got <= truth, f"cap={cap} invented pairs"
        # ... and never loses them: completeness holds at ANY cap,
        # including caps far below the 400-doc mega-cluster
        # (VERDICT r04 done-criterion was >=0.95 at cap 128; the
        # sub-split construction gives exactly 1.0)
        assert got == truth, (
            f"cap={cap} recall {len(got & truth) / len(truth):.3f} != 1.0"
        )
        assert twin_truth <= got
