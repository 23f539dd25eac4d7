"""Distribution statistics over fact tables: histograms, correlation,
independence tests, entropy, RFM scoring.

The analytics layer a fleet operator runs over frame/run metadata (the
reference's frame_stats table — operators/frame_stats.py — holds exactly
this kind of per-class count/confidence data; these operators are the
corpus-wide summaries computed FROM such tables).

Every operator here is one or two hash aggregations with map-side combine —
no windows over the fact table, no joins wider than a broadcast dimension —
so each survives a 1000-executor scale-up with a single shuffle whose width
is the group count, not the row count. All real-valued outputs accumulate
through DECIMAL (order-independent) or are sums of logs of exact integers,
so a SQL oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fixed_width_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 20,
    group_col: str | None = None,
) -> DataFrame:
    """Equi-width histogram of ``value_col`` (optionally per group): bin
    edges span the GLOBAL [min, max] so bins are comparable across groups.

    Two passes: a 1-row min/max aggregate broadcast back, then one count
    aggregation on (group, bin) — the histogram shuffle carries
    n_bins × |groups| rows. The max value is clamped into the last bin
    (half-open bins, closed top), the standard convention.

    NULL values are excluded (complete-cases: a NULL has no bin — without
    the filter, least(NULL, n_bins-1) would silently land NULLs in the
    last bin). Degenerate input where min == max (width 0, x/0 → NULL in
    Spark SQL) collapses to a single bin 0 holding every row.
    """
    df = df.filter(F.col(value_col).isNotNull())
    bounds = df.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(n_bins)
    bin_id = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - F.col("_lo")) / width).cast("int"),
            F.lit(n_bins - 1),
        )
    )
    keys = ([group_col] if group_col else []) + ["bin"]
    return (
        df.join(F.broadcast(bounds))
        .withColumn("bin", bin_id)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def pearson_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Pearson r from the sum/sum-of-squares identity, accumulated as
    DECIMAL so the result is independent of partition order (float
    addition isn't associative; decimal addition is). One aggregation.

    r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    Complete cases only: a row with a NULL x or y is excluded from ALL
    moments including n (a sum that skips NULLs paired with a count that
    doesn't yields moments of no actual sample). A group where either
    column is constant (den = 0) gets r = NULL — under ANSI mode the
    bare division would abort the job.
    """
    x, y = F.col(x_col), F.col(y_col)
    df = df.filter(x.isNotNull() & y.isNotNull())
    d = lambda c: F.sum(c.cast("decimal(28,10)")).cast("double")  # noqa: E731
    keys = [group_col] if group_col else []
    agg = (df.groupBy(*keys) if keys else df.groupBy()).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        d(x).alias("sx"),
        d(y).alias("sy"),
        d(x * x).alias("sxx"),
        d(y * y).alias("syy"),
        d(x * y).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("r"),
    )


def chi2_independence(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Chi-square statistic for independence of two categorical columns,
    with per-cell contributions: observed vs expected = row_total ×
    col_total / grand_total.

    One count aggregation on (a, b); marginals derive from the cell table
    (|a|×|b| rows), so the fact table is touched once. Returns one row per
    observed cell: (a, b, observed, expected, chi2_term) — the full-table
    statistic is the sum of chi2_term (plus the structural-zero terms,
    which are expected² / expected = expected; callers summing to a single
    statistic should add marginal products for unobserved cells — at the
    usual use here, both columns are low-cardinality and all cells occur).

    Complete-cases convention: rows where either category is NULL are
    excluded up front. (A NULL key would otherwise count toward the grand
    total while its cell vanished from the equi-joined marginals — NULL
    never equi-matches — inflating every expected count.)
    """
    df = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    cells = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("observed"))
    row_t = cells.groupBy("a").agg(F.sum("observed").alias("ra"))
    col_t = cells.groupBy("b").agg(F.sum("observed").alias("cb"))
    grand = cells.agg(F.sum("observed").cast("double").alias("gt"))
    ex = F.col("ra") * F.col("cb") / F.col("gt")
    return (
        cells.join(F.broadcast(row_t), "a")
        .join(F.broadcast(col_t), "b")
        .join(F.broadcast(grand))
        .select(
            "a",
            "b",
            "observed",
            F.round(ex, 6).alias("expected"),
            F.round(
                (F.col("observed") - ex) * (F.col("observed") - ex) / ex, 6
            ).alias("chi2_term"),
        )
    )


def token_entropy_by_group(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Shannon entropy (nats) of each group's token distribution —
    H = ln(N) − (Σ c·ln c)/N over per-token counts c. Low entropy flags a
    degenerate source (boilerplate, spam loops); the single-distribution
    sibling of source_kl_divergence.

    The identity avoids materializing probabilities: one explode + count
    on (group, token), then a group-level fold of c·ln c. Each c·ln c term
    is a pure function of an exact integer (identical in any engine); the
    SUM accumulates those terms as DECIMAL so partition order can't
    perturb the result.
    """
    from ..functions import text as T

    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("grp")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum((F.col("c") * F.log("c")).cast("decimal(28,12)"))
            .cast("double")
            .alias("_clnc"),
        )
        .select(
            "grp",
            "n_tokens",
            "n_distinct",
            F.round(
                F.log("n_tokens") - F.col("_clnc") / F.col("n_tokens"), 6
            ).alias("entropy_nats"),
        )
    )


def rfm_scores(
    orders: DataFrame,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """Recency/Frequency/Monetary quintile scores per customer — the
    classic behavioral segmentation. Recency = days since the customer's
    last order relative to the corpus max date (so the result is a pure
    function of the data, reproducible); F/M are order count and
    decimal-exact spend. Scores are 1–5, 5 best (recent / frequent /
    high-spend).

    Scale posture: scoring is by comparison against the exact quantile
    BOUNDARIES (a 1-row broadcast), not ntile — an unpartitioned ntile
    would funnel every customer through one sort task, while the
    threshold form is one per-customer aggregation plus a broadcast
    probe. Boundary semantics: ties share a score (the meaningful RFM
    behavior) instead of being split arbitrarily by sort order.

    Complete cases only: an order with a NULL date or NULL amount is
    excluded from all three metrics (a NULL recency would otherwise
    band to the BEST score — filter(bounds, NULL > q) is empty, and the
    recency inversion turns "no data" into 5), and a customer with no
    complete orders is absent rather than top-scored on missing data."""
    orders = orders.filter(
        F.col(ts_col).isNotNull() & F.col(amount_col).isNotNull()
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]
    qarr = "array(" + ", ".join(str(q) for q in qs) + ")"
    corpus_max = orders.agg(F.max(ts_col).alias("_maxd"))
    per = (
        orders.join(F.broadcast(corpus_max))
        .groupBy(key_col)
        .agg(
            F.datediff(F.first("_maxd"), F.max(ts_col)).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col(amount_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    bounds = per.agg(
        F.expr(f"percentile(recency_days, {qarr})").alias("rq"),
        F.expr(f"percentile(frequency, {qarr})").alias("fq"),
        F.expr(f"percentile(monetary, {qarr})").alias("mq"),
    )

    def band(col: str, bound: str) -> F.Column:
        """1 + #boundaries strictly below the value → ascending 1..n."""
        hits = F.filter(F.col(bound), lambda q: F.col(col) > q)
        return (F.lit(1) + F.size(hits)).cast("int")

    return per.join(F.broadcast(bounds)).select(
        key_col,
        "recency_days",
        "frequency",
        "monetary",
        # recency: smaller is better → invert the ascending band
        (F.lit(n_tiles + 1) - band("recency_days", "rq")).cast("int").alias("r_score"),
        band("frequency", "fq").alias("f_score"),
        band("monetary", "mq").alias("m_score"),
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """Equi-DEPTH histogram: bin edges are the global quantiles of the
    value (so bins hold ~equal mass — the form query optimizers and
    drift monitors keep, where equi-width wastes resolution on sparse
    tails). Same plan shape as rfm_scores' banding: one exact-quantile
    aggregate (1 row, broadcast) and one count aggregation — no sort of
    the fact table, no ntile. Bin b holds values in (q_b, q_{b+1}];
    values at or below the first boundary land in bin 0. Ties heavier
    than a bin width simply make that bin heavier — the honest behavior
    for skewed data. NULL values are excluded (percentile already skips
    them for the boundaries; without the filter every NULL row would
    silently inflate bin 0).
    """
    df = df.filter(F.col(value_col).isNotNull())
    qs = [i / n_bins for i in range(1, n_bins)]
    qarr = "array(" + ", ".join(str(q) for q in qs) + ")"
    bounds = df.agg(F.expr(f"percentile({value_col}, {qarr})").alias("qs"))
    bin_id = F.size(
        F.filter(F.col("qs"), lambda q: F.col(value_col) > q)
    ).cast("int")
    keys = ([group_col] if group_col else []) + ["bin"]
    return (
        df.join(F.broadcast(bounds))
        .withColumn("bin", bin_id)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )
