"""Report CLIs — the reference's three report entry points as one command.

Reference:
  app_run_moc_report.py:5-14                 -> `summary`
  app_run_moc_pay_tc_holders_report.py       -> `pay_tc_holders`
  app_run_report_last_transactions.py        -> `last_transactions`
(all delegating to report/historical.py; console output via tabulate,
report/historical.py:260,325 — here `df.show()`, the S9 console sink).

Usage:
  python -m moc_indexer_spark.report_cli [summary|pay_tc_holders|
      last_transactions|all] [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

REPORTS = {
    "summary": "report_summary",
    "pay_tc_holders": "report_pay_tc_holders",
    "last_transactions": "report_last_transactions",
}


def run_report(
    spark: SparkSession, which: str, sf_dir: str, n_rows: int = 20
) -> None:
    from .plans.registry import registry

    specs = {s.name: s for s in registry()}
    names = REPORTS.values() if which == "all" else [REPORTS[which]]
    for name in names:
        print(f"== {name} ==")
        specs[name].build(spark, sf_dir).show(n_rows, truncate=False)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which not in REPORTS and which != "all":
        raise SystemExit(f"unknown report {which!r}; one of "
                         f"{sorted(REPORTS)} or 'all'")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    from .session import get_spark

    spark = get_spark(app_name="moc-report")
    spark.sparkContext.setLogLevel("ERROR")
    run_report(spark, which, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
