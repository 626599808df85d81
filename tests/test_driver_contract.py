"""Simulate the driver's environment: a separate python process with a
DIFFERENT cwd and a default-config SparkSession (Spark 4 ANSI mode on,
no engine session factory) importing __spark_entry__.

Catches two failure classes invisible to in-repo tests:
  * Pandas-UDF closures that reference engine module globals
    (cloudpickle by-reference → ModuleNotFoundError on python workers)
  * queries that break under ANSI mode (strict casts)
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .appName("driver-sim")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as mod
    assert mod.entry(spark).count() > 0
    qs = mod.queries()
    sf = "/root/testdata/sf0.001"
    # the pandas-UDF paths are the fragile ones — exercise all of them
    for name in ("ewma_per_entity", "fpp_frequency_measure_ewma", "multimodal_decode_stub"):
        n = qs[name](spark, sf).count()
        assert n > 0, name
    print("DRIVER_SIM_OK")
    """
)


def test_contract_from_foreign_cwd():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "DRIVER_SIM_OK" in proc.stdout, proc.stderr[-3000:]
