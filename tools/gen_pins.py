"""Regenerate tools/pinned_expected.json — the exact pinned outputs for the
rows-only (no-SQL-oracle) queries that are nonetheless deterministic.

Every candidate is run at sf0.001 AND sf0.01 under the normal session, then
RE-RUN under the adversarial session (local[3], shuffle.partitions=7, AQE
off, fresh JVM); a query whose rendered output differs between the two runs
is NOT pinned (printed as unstable). This keeps the pin file honest: a later
mismatch in the gate is a real regression, never partitioning noise.

Usage:
    python tools/gen_pins.py            # verify-and-write
    python tools/gen_pins.py --verify   # re-check current pins only
    python tools/gen_pins.py --sf-dir /tmp/sf1-smoke --out tools/pinned_expected_sf1.json
        # pin the same candidates at another scale (e.g. the sf1 smoke
        # build) into a SEPARATE file — check_oracle merges every
        # tools/pinned_expected*.json, keyed by sf-dir basename
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Deterministic rows-only queries. (price_quantiles_approx — formerly the
# lone excluded row for approx_percentile merge-order sensitivity — now
# ships exact rank-error-bound BOOLEANS instead of the sketch values and is
# oracle-checked, r14.)
# r15: supplier_pagerank, part_copurchase_kcore, doc_dsir_log_weights and
# both doc_lm_perplexity rows left this list — they carry hash-exact DuckDB
# oracles now (unrolled power method / recursive peel / ln-ratio twins with
# rounding absorbing libm ulps). Every remaining candidate is genuinely
# non-SQL: xxhash64 signatures, Spark-internal sketches, media decode,
# iterative BPE, BFD bin state, float semdedup variants, and Gumbel top-k
# (whose SELECTION depends on unrounded key order — oracle-unsafe).
CANDIDATES = [
    "approx_distinct_parts",
    "audio_feature_stats",
    "bpe_segmentation_stats",
    "bpe_trained_merges",
    "doc_compression_quality",
    "pack_sequences_bfd_stats",   # sequential bin state (BFD), deterministic
    "dsir_gumbel_sample",         # pure per-row Gumbel key on the folded
                                  # weight; top-k + id tiebreak
    "hll_sketch_union_users",
    "image_near_dup_pairs",
    "image_phash_stats",
    "media_feature_neardup_sim",
    "semdedup_flags_adaptive_float",  # production path: hash-defined sample,
                                      # decimal batch sums, fixed fold order
    "semdedup_flags_two_level_p2",        # r12 narrow-probe point of the
                                          # probe-width sweep (w=2)
    "semdedup_flags_adaptive_two_level",  # r11 scale assignment: same model,
                                          # deterministic two-level probe
    "simhash64_near_dup_pairs",
]
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
PIN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pinned_expected.json")

_CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
builder = SparkSession.builder.master(%(master)r)
for k, v in %(conf)r:
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from etl_poc_spark import registry
from etl_poc_spark.operators.pins import release_pins
sys.path.insert(0, %(tools)r)
from check_oracle import _pin_rows
registry.load_all()
out = {}
for name in %(names)r:
    for sf in %(sf_dirs)r:
        pdf = registry.QUERIES[name](spark, sf).toPandas()
        release_pins(); spark.catalog.clearCache()
        tag = sf.rsplit("/", 1)[1]
        out.setdefault(name, {})[tag] = {
            "columns": sorted(pdf.columns), "rows": _pin_rows(pdf)}
print("PINJSON:" + json.dumps(out, sort_keys=True))
"""


def _run(master: str, conf: list[tuple[str, str]], sf_dirs: list[str], names: list[str] | None = None) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD % {
        "repo": repo,
        "tools": os.path.join(repo, "tools"),
        "master": master,
        "conf": conf,
        "names": names or CANDIDATES,
        "sf_dirs": sf_dirs,
    }
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"pin child ({master}) failed rc={res.returncode}:\n"
            f"{res.stderr[-3000:]}"
        )
    for line in res.stdout.splitlines():
        if line.startswith("PINJSON:"):
            return json.loads(line[len("PINJSON:"):])
    raise RuntimeError(f"child produced no pin JSON: {res.stdout[-500:]}")


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true")
    ap.add_argument(
        "--sf-dir", action="append", default=None,
        help="override the pinned scales (repeatable); default sf0.001+sf0.01",
    )
    ap.add_argument(
        "--out", default=PIN_PATH,
        help="pin file to write (check_oracle merges tools/pinned_expected*.json)",
    )
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated query names to pin instead of the default "
        "CANDIDATES list — e.g. the sf1 oracle-capacity exclusions "
        "(embedding_pq_topk,embedding_ivfpq_topk), whose DuckDB oracle "
        "can't run at sf1 but whose Spark output pins fine",
    )
    ap.add_argument(
        "--hash-only", action="store_true",
        help="store {columns, n_rows, sha256} instead of full rows — for "
        "large scales where the row dump is tens of MB; stability is "
        "still compared on full rows before hashing",
    )
    args = ap.parse_args()
    sf_dirs = args.sf_dir or SF_DIRS

    # fresh-JVM children default to a 1g driver — fine at sf0.01, OOM at
    # sf1; match the engine session's sizing
    mem = ("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    names = args.queries.split(",") if args.queries else None
    normal = _run("local[32]", [("spark.sql.shuffle.partitions", "32"), mem], sf_dirs, names)
    advers = _run(
        "local[3]",
        [("spark.sql.shuffle.partitions", "7"),
         ("spark.sql.adaptive.enabled", "false"), mem],
        sf_dirs,
        names,
    )
    stable = {n: v for n, v in normal.items() if advers.get(n) == v}
    unstable = sorted(set(normal) - set(stable))
    for n in unstable:
        print(f"UNSTABLE (not pinned): {n}")
    def _to_hash_only(full: dict) -> dict:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from check_oracle import _pin_digest

        return {
            n: {
                sf: {
                    "columns": v["columns"],
                    "n_rows": len(v["rows"]),
                    "sha256": _pin_digest(v["rows"]),
                }
                for sf, v in by_sf.items()
            }
            for n, by_sf in full.items()
        }

    if args.hash_only:
        stable = _to_hash_only(stable)
    if args.verify:
        current = json.load(open(args.out))
        # infer the pin format from the loaded file (ADVICE r12): a
        # digest pin file (sha256 keys) must be compared against the
        # hashed form of the fresh run even without --hash-only, or
        # bit-identical values would always report DIFFER
        if not args.hash_only and any(
            "sha256" in v
            for by_sf in current.values()
            for v in by_sf.values()
        ):
            stable = _to_hash_only(stable)
        ok = current == stable
        print("pins", "match" if ok else "DIFFER from", "a fresh stable run")
        return 0 if ok else 1
    if names and os.path.exists(args.out):
        # subset pinning MERGES into the existing file — a --queries run
        # must never silently drop every other query's pins
        merged = json.load(open(args.out))
        merged.update(stable)
        stable = merged
    with open(args.out, "w") as fh:
        json.dump(stable, fh, indent=0, sort_keys=True)
        fh.write("\n")
    print(f"pinned {len(stable)} queries x {len(sf_dirs)} sfs -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
