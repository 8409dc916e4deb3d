"""Single-pass data-quality constraint reports (Deequ-shaped).

The pipeline-gate primitive a medallion promotion runs before
publishing a Silver/Gold table: completeness, uniqueness, domain /
range compliance and referential-integrity checks, evaluated together
and emitted as one small ``(tbl, col, chk, value, ok)`` frame a
scheduler can assert on.

``value`` is a BIGINT in exact integer units — raw counts for
count-shaped checks (row_count, fk_containment orphans) and
parts-per-million (``floor(cnt * 1e6 / n)``) for fraction-shaped
checks (completeness / uniqueness / compliance).  The r13 review
caught the hazard of the earlier ``round(double, 6)`` form: Spark
rounds a double via its shortest decimal repr with HALF_UP while
DuckDB rounds the binary value, so a fraction landing on a
7th-decimal half boundary could flip a cross-engine hash gate.  The
ppm value is computed with exact integer arithmetic on BOTH engines
(decimal mod/divide here, HUGEINT ``//`` in the oracle), so no float
ever enters the report.

Scale shape — the whole point of the design:

- ALL intra-table checks (row count, completeness, uniqueness,
  every compliance predicate) ride ONE wide aggregate over the table:
  a single scan + a single partial-agg reduce.  A naive
  per-constraint loop re-scans the table k times; at 100 TB that is
  k full-table reads.  The wide-agg form is how Deequ batches its
  analyzers into shared scans.
- ``uniqueness`` uses exact ``count_distinct`` — Spark plans mixed
  distinct/non-distinct aggregates with one EXPAND + two-stage agg,
  still a single scan.  (At extreme cardinality a caller swaps in
  ``approx_count_distinct``; exactness is kept here because the
  report feeds a hash-checked oracle.)
- referential integrity (FK containment) is a LEFT ANTI join count —
  the only check needing a second input; the build side is the
  referenced DISTINCT key set, which AQE broadcasts when small.
- the final explode of the metric struct array happens on a ONE-ROW
  frame, so rendering the report adds no work beyond the aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: report schema, fixed: (tbl, col, chk, value, ok)
_REPORT_COLS = ("tbl", "col", "chk", "value", "ok")


#: fraction checks are reported in parts-per-million (see module doc)
PPM = 1_000_000


def _row(tbl: str, col: str, chk: str, value: Column, ok: Column) -> Column:
    return F.struct(
        F.lit(tbl).alias("tbl"),
        F.lit(col).alias("col"),
        F.lit(chk).alias("chk"),
        value.cast("long").alias("value"),
        ok.alias("ok"),
    )


def _explode_report(agg_row: DataFrame, rows: list[Column]) -> DataFrame:
    return agg_row.select(F.explode(F.array(*rows)).alias("r")).select(
        *(F.col(f"r.{c}").alias(c) for c in _REPORT_COLS)
    )


def profile_report(
    df: DataFrame,
    tbl: str,
    complete_cols: list[str] | None = None,
    unique_cols: list[str] | None = None,
    compliance: list[tuple[str, str, Column]] | None = None,
) -> DataFrame:
    """All intra-table checks in ONE wide aggregate pass.

    - row count (always emitted; passed iff > 0)
    - ``completeness``: non-null fraction per named column (1.0 to
      pass)
    - ``uniqueness``: exact distinct/count fraction per named column
      (1.0 to pass)
    - ``compliance``: ``(col_label, check_name, predicate)`` entries;
      value = fraction of rows satisfying the predicate (NULL counts
      as non-compliant — a row that can't prove compliance isn't
      compliant), 1.0 to pass.

    Fraction values are emitted in integer PPM (see module doc); the
    pass tests are pure integer equalities (``cnt == n``), never a
    float comparison.
    """
    complete_cols = complete_cols or []
    unique_cols = unique_cols or []
    compliance = compliance or []
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in complete_cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
    for c in unique_cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    for i, (_, _, pred) in enumerate(compliance):
        aggs.append(
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).alias(f"_c_{i}")
        )
    one = df.agg(*aggs)
    n = F.col("_n")

    def _ppm(cnt: Column) -> Column:
        # exact integer floor(cnt * 1e6 / n), no float surface: the
        # numerator is exact in DECIMAL(38,0), mod/subtract make it
        # divisible, and decimal division of exactly-divisible values
        # is exact.  The n > 0 guard doubles as the ANSI-mode
        # divide-by-zero shield (the session runs Spark 4 ANSI, where
        # x / 0 THROWS; CASE-protected it is NULL, matching DuckDB)
        num = cnt.cast("decimal(38,0)") * F.lit(PPM)
        nd = n.cast("decimal(38,0)")
        return F.when(n > 0, ((num - num % nd) / nd).cast("long"))

    def _ok(cnt: Column) -> Column:
        # FAIL-CLOSED on an empty table: a NULL ok would slip through
        # a scheduler's three-valued `filter(~ok).count() == 0`
        # promotion gate — a check that can't prove itself has failed.
        # Integer equality, never `frac == 1.0`.
        return F.coalesce((n > 0) & (cnt == n), F.lit(False))

    rows: list[Column] = [_row(tbl, "*", "row_count", n, n > 0)]
    for c in complete_cols:
        cnt = F.col(f"_nn_{c}")
        rows.append(_row(tbl, c, "completeness", _ppm(cnt), _ok(cnt)))
    for c in unique_cols:
        cnt = F.col(f"_nd_{c}")
        rows.append(_row(tbl, c, "uniqueness", _ppm(cnt), _ok(cnt)))
    for i, (col_label, chk, _) in enumerate(compliance):
        cnt = F.col(f"_c_{i}")
        rows.append(_row(tbl, col_label, chk, _ppm(cnt), _ok(cnt)))
    return _explode_report(one, rows)


def fk_containment_report(
    child: DataFrame,
    child_tbl: str,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Referential integrity: count of child rows whose key has no
    match in the parent key set (LEFT ANTI join; the parent's
    distinct-key build side broadcasts under AQE when small).  Value =
    orphan count, passed iff 0."""
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    one = orphans.agg(F.count(F.lit(1)).alias("_orphans"))
    return _explode_report(
        one,
        [
            _row(
                child_tbl,
                child_key,
                "fk_containment",
                F.col("_orphans"),
                F.col("_orphans") == 0,
            )
        ],
    )


def dq_anomaly_gate(
    history: DataFrame,
    k: int = 3,
    min_dev: int = 1000,
) -> DataFrame:
    """Anomaly verdicts over a per-batch constraint-report series —
    the Deequ anomaly-check tier on top of the monitor store: a batch
    whose metric deviates more than ``k`` MADs from the series median
    is flagged (median/MAD, not mean/stddev, so one bad batch cannot
    drag its own acceptance region after it).

    Everything is INTEGER, so the verdict replays bit-exactly:

    - metric values arrive as the report's BIGINT units (ppm
      fractions / raw counts);
    - the median is the DISCRETE lower median — the row at
      ``(n - 1) div 2 + 1`` under the total order ``(value,
      batch_id)`` — a data value, never an interpolated float;
    - the MAD is the same selection over ``|value - median|``;
    - the flag is ``dev > greatest(k * mad, min_dev)``.  The
      ``min_dev`` floor keeps a near-constant series (mad = 0 or
      tiny) from flagging benign jitter: a row_count that wobbles by
      a few rows, a completeness a few ppm off — Deequ's absolute
      tolerance knob expressed in the report's integer units.

    Scale shape: the history is METRICS-sized by construction
    (batches x checks — the monitor sink writes O(checks) rows per
    batch regardless of batch volume), so the per-metric window sorts
    partition on (tbl, col, chk) with at most #batches rows each;
    the median/MAD frames broadcast back.  Nothing here ever touches
    the monitored data itself.

    Returns ``(tbl, col, chk, batch_id, value, med, mad,
    is_anomaly)`` — the full annotated series, one verdict per stored
    report row.  Rows with NULL value (empty-batch fractions) are
    excluded from both the statistics and the output: an
    undefined metric has its own fail-closed ``ok = false`` in the
    report; the anomaly tier judges only measured values.
    """
    from pyspark.sql.window import Window

    g = ["tbl", "col", "chk"]
    h = history.filter(F.col("value").isNotNull()).select(
        *g, F.col("batch_id").cast("long").alias("batch_id"),
        F.col("value").cast("long").alias("value"),
    )
    wn = Window.partitionBy(*g)

    def _lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        wv = Window.partitionBy(*g).orderBy(F.col(val), F.col("batch_id"))
        return (
            df.withColumn("__rn", F.row_number().over(wv))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .filter(F.col("__rn") == F.floor((F.col("__n") - 1) / 2) + 1)
            .select(*g, F.col(val).alias(out))
        )

    med = _lower_median(h, "value", "med")
    dev = h.join(F.broadcast(med), g).withColumn(
        "__dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = _lower_median(dev, "__dev", "mad")
    return (
        dev.join(F.broadcast(mad), g)
        .select(
            *g,
            "batch_id",
            "value",
            "med",
            "mad",
            (
                F.col("__dev")
                > F.greatest(
                    F.lit(int(k)).cast("long") * F.col("mad"),
                    F.lit(int(min_dev)).cast("long"),
                )
            ).alias("is_anomaly"),
        )
    )
