"""Plot sink — thin driver-side client (SURVEY §2.1 S7; reference
analysis.py:203-364).

Plotting is inherently non-relational: the engine's job ends at the D4
DataFrame; this util collects ONE counter's (small, post-aggregation)
series with toPandas and renders the reference's dual-axis figure
(counts + eta over time). matplotlib is optional — absent in this
container — so the import is gated with a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plot_analyzed(
    analyzed: DataFrame,
    counter: str,
    output_path: str,
    rebin_factor: int = 1,
    logscale_eta: bool = False,
    title: str | None = None,
) -> str:
    """Render one counter's counts + eta to a PNG.

    ``rebin_factor`` applies the reference's plot-time re-rebin
    (analysis.py:243-268): every k consecutive points → summed count,
    averaged eta, last timestamp — as a DataFrame aggregation, so only
    the final plotted points ever reach the driver.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - matplotlib absent in CI image
        raise ImportError(
            "matplotlib is not installed; the plot sink is an optional "
            "driver-side client (engine output is the analyzed DataFrame)"
        ) from e

    series = analyzed.filter(F.col("counter") == counter)
    if rebin_factor > 1:
        from pyspark.sql import Window

        w = Window.partitionBy("counter").orderBy("interval_start")
        series = (
            series.withColumn(
                "grp", F.floor((F.row_number().over(w) - 1) / rebin_factor)
            )
            .groupBy("counter", "grp")
            .agg(
                F.sum("count").alias("count"),
                F.avg("eta").alias("eta"),
                F.max("interval_start").alias("interval_start"),
            )
        )
    pdf = (
        series.select("interval_start", "count", "eta")
        .orderBy("interval_start")
        .toPandas()
    )

    fig, ax1 = plt.subplots(figsize=(10, 4))
    ax1.plot(pdf["interval_start"], pdf["count"], color="tab:blue", lw=1)
    ax1.set_ylabel("count", color="tab:blue")
    ax2 = ax1.twinx()
    ax2.plot(pdf["interval_start"], pdf["eta"], color="tab:red", lw=1)
    ax2.set_ylabel("eta", color="tab:red")
    if logscale_eta:
        ax2.set_yscale("log")
    ax1.set_title(title or counter)
    fig.autofmt_xdate()
    fig.tight_layout()
    fig.savefig(output_path, dpi=120)
    plt.close(fig)
    return output_path
