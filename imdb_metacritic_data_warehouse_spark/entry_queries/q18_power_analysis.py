"""Round-8 wave 34 — experiment design: the power / sample-size
calculator that closes the A/B loop (ab_test_lift and welch_ttest test
AFTER the fact; this op answers "how long must the experiment run")."""

from __future__ import annotations

from ._registry import F, _events, _units4, query

# z_{0.975} and z_{0.80} — the standard two-sided alpha=0.05 /
# power=0.80 design constants (exact literals parse to identical
# doubles on both engines).
_Z_A = "1.959963984540054"
_Z_B = "0.8416212335729143"


# Two-arm sample size n per arm = 2*(z_a + z_b)^2 * sigma^2 / delta^2
# for detecting a shift of delta = mde * mean in the event-value
# metric, using the corpus-observed variance.  Variance assembly is the
# welch_ttest pattern (exact int64 cent sums; the sum of squared cents
# in DECIMAL(38,0), cast once — oracle-green at both gate SFs since
# r4); the z constants are shared literals; CEIL of identical doubles
# is identical.  One corpus aggregate + a 4-row MDE grid: nothing
# data-sized moves twice, and at 100 TB the aggregate is the entire
# cost.
@query(
    "ab_power_sample_size_events",
    f"""
    WITH f AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx,
             CAST(SUM(CAST(cents AS DECIMAL(19,0))
                      * CAST(cents AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx
      FROM f
    ),
    v AS (
      SELECT n,
             CAST(sx AS DOUBLE) / n AS mean_c,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
              * CAST(sx AS DOUBLE) / n) / (n - 1) AS var_c
      FROM s
    ),
    grid AS (SELECT unnest([0.01, 0.02, 0.05, 0.10]) AS mde)
    SELECT round(mde * 100, 1) AS mde_pct,
           round(mean_c / 100.0, 6) AS mean_value,
           round(sqrt(var_c) / 100.0, 6) AS stddev_value,
           CAST(CEIL(2.0 * ({_Z_A} + {_Z_B}) * ({_Z_A} + {_Z_B})
                     * var_c / (mde * mean_c * mde * mean_c)) AS BIGINT)
             AS n_per_arm
    FROM v, grid ORDER BY mde_pct
    """,
)
def ab_power_sample_size_events(spark, sf_dir):
    e = _events(spark, sf_dir).select(
        F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    cd = F.col("cents").cast("decimal(19,0)")
    s = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sx"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("sxx"),
    )
    mean_c = F.col("sx").cast("double") / F.col("n")
    var_c = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    v = s.select(
        "n", mean_c.alias("mean_c"), var_c.alias("var_c")
    )
    grid = spark.createDataFrame(
        [(0.01,), (0.02,), (0.05,), (0.10,)], "mde double"
    )
    z2 = F.expr(f"({_Z_A} + {_Z_B}) * ({_Z_A} + {_Z_B})")
    return (
        v.crossJoin(F.broadcast(grid))
        .select(
            F.round(F.col("mde") * 100, 1).alias("mde_pct"),
            F.round(F.col("mean_c") / F.lit(100.0), 6).alias("mean_value"),
            F.round(F.sqrt(F.col("var_c")) / F.lit(100.0), 6).alias(
                "stddev_value"
            ),
            F.ceil(
                F.lit(2.0)
                * z2
                * F.col("var_c")
                / (F.col("mde") * F.col("mean_c") * F.col("mde") * F.col("mean_c"))
            )
            .cast("bigint")
            .alias("n_per_arm"),
        )
        .orderBy("mde_pct")
    )
