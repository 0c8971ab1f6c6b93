"""Round-13 FULL-registry 10x sweep (sweep_r11.py + an optional
SPARK_GRAFT_SWEEP_ONLY=name,name,... filter for touched-subset legs) with an ORACLE-RESULT CACHE
(VERDICT r10 #4: the closure oracles alone cost 37 min of DuckDB per
sweep; at 324 names x 2 sweeps/round the builder re-verifies unchanged
queries for hours).

Methodology = tools/sweep_r10b.py's three legs, with one change: the
DuckDB side is cached per (query name, sha256 of the oracle SQL,
fixture fingerprint) in tools/oracle_cache.json.  The SPARK side always
runs live — it is the code under test, and the executed-plan budgets
(scan / window / hinted-broadcast) assert on every run.  Its result is
digested through the gate's own canonicalization
(mapreducer_spark.oracle.result_digest), so a cache-hit comparison is
exactly as strict as a live one: same columns, same row count, same
normalized-value hash.

Staleness is structural, not temporal: any edit to a query's oracle SQL
changes the key; any fixture regeneration changes the fingerprint; both
force a live DuckDB run.  On top of that a seeded 10% refresh slice
(names sorted, sha-picked — deterministic per fixture) re-runs DuckDB on
HITS and cross-checks the stored digest, so a corrupted cache row cannot
survive a round undetected.  Every cache event is reported in the output
row ("oracle": "cached" | "live" | "refresh-verified").

Usage: python tools/sweep_r13.py {default|frozen|rowsonly} [start [end]]
Frozen leg needs SPARK_GRAFT_ORACLE_SF=<repo>/.scale10/sf1 like r10b.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducer_spark.oracle import (  # noqa: E402
    duck_connection,
    result_digest,
    run_duck,
    run_spark_gated,
)
from mapreducer_spark.registry import all_queries  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE10 = os.path.join(REPO, ".scale10", "sf1")
CACHE_PATH = os.path.join(REPO, "tools", "oracle_cache.json")

FROZEN_PREFIXES = (
    "ann_ivf",
    "ann_pq",
    "ann_index",
    "ann_mmr",
    "ivf_",
    "semdedup",
    # r13: the RAG capstone chains the frozen-index IVF oracle, so its
    # oracle renders per SPARK_GRAFT_ORACLE_SF like the ann_* family.
    "retrieval_pipeline",
)
# r13: neardup_clusters / corpus_after_neardup_dedup un-excluded — their
# oracles are now the unrolled MATERIALIZED pointer-jump formulation
# (clustering._cc_label_ctes), which terminates at 10x (154 s measured)
# where the old recursive all-pairs closure did not.  Only the exact
# O(U^2) profile oracle stays rows-only at 10x (by-design weak twin).
ORACLE_EXCLUDED = {
    "user_activity_similarity_blocked",
}
REFRESH_FRACTION = 0.1


def legs() -> dict[str, list[str]]:
    qs = all_queries()
    default, frozen, rowsonly = [], [], []
    for name in sorted(qs):
        if qs[name].oracle is None or name in ORACLE_EXCLUDED:
            rowsonly.append(name)
        elif name.startswith(FROZEN_PREFIXES):
            frozen.append(name)
        else:
            default.append(name)
    return {"default": default, "frozen": frozen, "rowsonly": rowsonly}


def fixture_fingerprint(sf_dir: str) -> str:
    """md5 over the bytes of every table file in the fixture, in name
    order — regeneration (tools/gen_scale10.py) changes this and thereby
    invalidates every cached oracle row for the old fixture."""
    h = hashlib.md5()
    for name in sorted(os.listdir(sf_dir)):
        path = os.path.join(sf_dir, name)
        if not os.path.isfile(path):
            continue
        h.update(name.encode())
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()


def load_cache() -> dict:
    try:
        with open(CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def save_cache(cache: dict) -> None:
    tmp = CACHE_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, CACHE_PATH)


def in_refresh_slice(name: str, fixture_fp: str) -> bool:
    """Deterministic ~10% slice, re-drawn per fixture: sha256 of
    (fixture, name) mod 10 == 0.  Seeded by the fixture so each
    regeneration rotates which names get live re-verification."""
    d = hashlib.sha256(f"{fixture_fp}|{name}".encode()).digest()
    return d[0] % int(1 / REFRESH_FRACTION) == 0


def main() -> None:
    leg = sys.argv[1]
    names = legs()[leg]
    only = os.environ.get("SPARK_GRAFT_SWEEP_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        names = [n for n in names if n in keep]
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3]) if len(sys.argv) > 3 else len(names)
    names = names[start:end]
    if not os.path.isdir(SCALE10):
        raise SystemExit(
            f"{SCALE10} missing — run `python tools/gen_scale10.py` first"
        )
    out_path = os.path.join(
        os.path.dirname(__file__), f"oracle_at_scale_r13_{leg}_run.jsonl"
    )
    fixture_fp = fixture_fingerprint(SCALE10)
    cache = load_cache()
    spark = get_spark(
        app_name=f"sweep-r13-{leg}",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_PROBE_MEM", "24g"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    n_cached = n_live = 0
    with open(out_path, "a") as out:
        for name in names:
            t0 = time.perf_counter()
            oracle_mode = None
            if leg == "rowsonly":
                try:
                    _cols, rows = run_spark_gated(spark, qs[name], SCALE10)
                    status = f"rows-only OK ({len(rows)} rows)"
                except Exception as exc:  # noqa: BLE001
                    status = f"ERR: {str(exc)[:200]}"
            else:
                q = qs[name]
                key = "|".join(
                    (
                        name,
                        hashlib.sha256(q.oracle.encode()).hexdigest()[:16],
                        fixture_fp,
                    )
                )
                try:
                    scols, srows = run_spark_gated(spark, q, SCALE10)
                    sdig = result_digest(scols, srows)
                    hit = cache.get(key)
                    refresh = hit is not None and in_refresh_slice(
                        name, fixture_fp
                    )
                    if hit is None or refresh:
                        con = duck_connection(SCALE10)
                        try:
                            dcols, drows = run_duck(con, q.oracle)
                        finally:
                            con.close()
                        ddig = result_digest(dcols, drows)
                        if refresh:
                            assert ddig == hit, (
                                f"{name}: cached oracle digest diverges "
                                f"from live re-run — cache corrupt; "
                                f"delete tools/oracle_cache.json"
                            )
                            oracle_mode = "refresh-verified"
                        else:
                            oracle_mode = "live"
                        cache[key] = ddig
                        save_cache(cache)
                        n_live += 1
                    else:
                        ddig = hit
                        oracle_mode = "cached"
                        n_cached += 1
                    assert sdig["cols"] == ddig["cols"], (
                        f"{name}: column mismatch spark={sdig['cols']} "
                        f"duck={ddig['cols']}"
                    )
                    assert sdig["n"] == ddig["n"], (
                        f"{name}: row count mismatch spark={sdig['n']} "
                        f"duck={ddig['n']}"
                    )
                    assert sdig["hash"] == ddig["hash"], (
                        f"{name}: value mismatch (normalized sha256 "
                        f"{sdig['hash'][:12]} != {ddig['hash'][:12]})"
                    )
                    status = "MATCH"
                except AssertionError as exc:
                    status = f"MISMATCH: {str(exc)[:200]}"
                except Exception as exc:  # noqa: BLE001
                    status = f"ERR: {str(exc)[:200]}"
            row = {
                "query": name,
                "sf": "10x-sf0.1",
                "status": status,
                "oracle": oracle_mode,
                "sec": round(time.perf_counter() - t0, 1),
            }
            out.write(json.dumps(row) + "\n")
            out.flush()
            print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {"leg": leg, "oracle_cached": n_cached, "oracle_live": n_live}
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
