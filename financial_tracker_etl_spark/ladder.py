"""Scale-ladder harness: measure a registry query at k-replicated input.

``python -m financial_tracker_etl_spark.ladder [--ks 1,4,8] [--sf-dir D] name...``

Method (the BASELINE.md "replicated-input ladder", now a persistent
tool instead of the ad-hoc scripts earlier rounds used): each fact
table is unioned k times with per-replica key offsets so joins stay
consistent and keys/groups grow k-fold like genuinely new data —
compute grows k-fold under IDENTICAL plans, isolating how wall-clock
scales with data on a fixed box. Flat-to-sublinear rungs mean the plan
is shuffle-bounded by keys/state rather than corpus size (added data
fills idle cores), the property that transfers to a multi-executor
cluster; near-linear rungs flag a data-proportional serial stage (the
shape that found `mad_quantity_by_flag`'s 3-reducer sort in round 5).

Replication rules (mirrors the documented measurement lessons,
BASELINE.md):

- dims (`region nation supplier part`) are fixed — their key spaces
  are referenced by fact foreign keys that must keep resolving;
- fact keys are offset per replica (`customer.c_custkey` together
  with `orders.o_custkey`; `orders.o_orderkey` with
  `lineitem.l_orderkey`; `events.event_id`/`user_id`;
  `documents.doc_id`; `embeddings.vec_id`) so replicas are new
  entities, not hot-key updates;
- `documents.text` gets a PER-WORD replica suffix, else replicas are
  near-duplicates of each other and pair-producing dedup queries
  measure their (correct) quadratic pair output instead of operator
  cost;
- `embeddings.embedding` is ROTATED by the replica index (norm- and
  distribution-preserving, but rotated random vectors are far apart),
  so similarity queries see new points, not k-fold exact duplicates.

Streaming (`stream_*`) queries are excluded: their input is the staged
request-topic directory keyed by ``sf_dir``, not the table loader —
the streaming ladder (BASELINE.md round 4) replays k-replicated
traffic through that path instead.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import catalog
from .session import get_spark

# fact table -> key columns offset per replica (joins stay consistent:
# both sides of every fact-fact foreign key appear here)
FACT_KEYS = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
# far beyond any real key at sf0.1 (max ~600k) times any plausible k
KEY_OFFSET = 50_000_000


def replicate(df: DataFrame, name: str, k: int) -> DataFrame:
    if k <= 1 or name not in FACT_KEYS:
        return df
    # Upcast every offset key to long FIRST (base replica included, so
    # unionByName types agree): casting the offset result back to a
    # 32-bit column type would silently wrap for large --ks, turning
    # replicas into hot-key collisions instead of new entities.
    from pyspark.sql.types import IntegerType, LongType, ShortType

    for c in FACT_KEYS[name]:
        t = df.schema[c].dataType
        if isinstance(t, (IntegerType, ShortType)):
            df = df.withColumn(c, F.col(c).cast("long"))
        elif not isinstance(t, LongType):
            raise SystemExit(
                f"{name}.{c} has non-integral key type {t}; cannot offset"
            )
    if name == "embeddings":
        # rotation amount is modulo the REAL embedding width — a
        # hard-coded 64 would silently truncate other fixtures (and
        # make replica 64 an exact duplicate of the base)
        dim_row = df.select(F.size("embedding").alias("d")).head()
        dim = int(dim_row["d"]) if dim_row else 0
    parts = [df]
    for i in range(1, k):
        r = df
        for c in FACT_KEYS[name]:
            r = r.withColumn(c, F.col(c) + F.lit(i * KEY_OFFSET).cast("long"))
        if name == "documents":
            # per-word salt: every shingle/fingerprint differs between
            # replicas, so near-dup candidate sets stay replica-local
            r = r.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", rf"$1{i}q")
            )
        if name == "embeddings" and dim:
            rot = i % dim
            if rot:
                r = r.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), rot + 1, dim - rot),
                        F.slice(F.col("embedding"), 1, rot),
                    ),
                )
        parts.append(r)
    return reduce(lambda a, b: a.unionByName(b), parts)


class _patched_loader:
    """Swap every query module's ``load_table`` binding (bound at module
    import, so patching only the catalog would miss them) for a
    k-replicating wrapper."""

    def __init__(self, k: int):
        self.k = k

    def __enter__(self):
        # Discover every module in the package that holds a load_table
        # binding instead of hand-listing them: round 5 hand-listed
        # queries.{core,analytics,ext} and missed plans.historical_repair,
        # so its five queries laddered on UNREPLICATED input.
        import importlib
        import pkgutil

        import financial_tracker_etl_spark as pkg

        base = catalog.load_table
        k = self.k

        def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
            return replicate(base(spark, sf_dir, name), name, k)

        self._sites = []
        failed: list[str] = []
        for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
            try:
                mod = importlib.import_module(info.name)
            except Exception:
                # A module that fails to import here could hold a
                # load_table binding we'd silently miss, laddering its
                # queries on unreplicated input (the round-5 bug class).
                # Surface the miss instead of swallowing it.
                failed.append(info.name)
                continue
            orig = getattr(mod, "load_table", None)
            if orig is base:
                self._sites.append((mod, orig))
        if failed:
            import warnings

            warnings.warn(
                "ladder: modules failed to import at patch time and were "
                f"NOT checked for load_table bindings: {sorted(failed)}",
                stacklevel=2,
            )
        # the query/plan modules that are KNOWN to hold the binding must
        # never be in the failed set — fail loud, not flat (explicit
        # raise, not assert: this invariant must survive `python -O`)
        if any(n.split(".")[1] in ("queries", "plans") for n in failed):
            raise RuntimeError(
                f"ladder: query/plan module import failed at patch time: {failed}"
            )
        if not any(m is catalog for m, _ in self._sites):
            raise RuntimeError(
                "ladder: catalog.load_table was not captured for patching"
            )
        for mod, _ in self._sites:
            mod.load_table = load
        return self

    def __exit__(self, *exc):
        for mod, orig in self._sites:
            mod.load_table = orig


def force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--ks", default="1,4,8")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--no-warmup", action="store_true", help="skip the sf0.001 JIT warmup pass"
    )
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    from .queries import registry

    reg = registry()
    bad = [n for n in args.names if n not in reg]
    if bad:
        raise SystemExit(f"unknown queries: {bad}")
    streamy = [n for n in args.names if n.startswith("stream_")]
    if streamy:
        raise SystemExit(
            f"streaming queries take traffic, not tables — ladder them "
            f"through the staged-traffic path instead: {streamy}"
        )

    import os

    # warmup on the smallest sibling scale of --sf-dir (JIT/codegen
    # priming); skip gracefully when the layout has no such sibling
    warmup_dir = os.path.join(
        os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001"
    )
    if warmup_dir == args.sf_dir.rstrip("/") or not os.path.isdir(warmup_dir):
        warmup_dir = None

    spark = get_spark("ladder")
    out: dict[str, dict[int, float]] = {}
    for name in args.names:
        spec = reg[name]
        if not args.no_warmup and warmup_dir:
            force(spec.fn(spark, warmup_dir))
        row: dict[int, float] = {}
        for k in ks:
            spark.catalog.clearCache()
            with _patched_loader(k):
                t0 = time.perf_counter()
                force(spec.fn(spark, args.sf_dir))
                row[k] = round(time.perf_counter() - t0, 2)
        out[name] = row
        print(json.dumps({"query": name, "sec_by_k": row}), flush=True)
    ratios = {
        n: round(r[ks[-1]] / max(r[ks[0]], 0.01), 2) for n, r in out.items()
    }
    print(json.dumps({"summary_last_over_first": ratios}), flush=True)


if __name__ == "__main__":
    main()
