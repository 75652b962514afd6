"""Vanilla-session regression gate.

Round 1 scored 0/50 on the driver because every query assumed a session
pre-configured by ``session.get_spark`` (nanosAsLong for the fixtures'
TIMESTAMP(NANOS) column, UTC, Arrow). The driver passes its OWN bare
``SparkSession`` into ``queries()`` callables, so the engine must
self-configure any foreign session (``session.ensure_runtime_confs``,
applied in ``Catalog.__post_init__`` and the registry wrapper).

This test reproduces the driver's environment exactly: a subprocess builds
a bare ``SparkSession.builder.master("local[2]").getOrCreate()`` with NO
engine confs and runs one query per family through ``__spark_entry__``.
It must never be run through the shared (pre-configured) test session —
that is precisely the blind spot that missed round 1's failure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession

    # A deliberately bare session: no engine confs at all (driver contract).
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("vanilla-gate")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as e

    qs = e.queries()
    # one representative per family prefix (ql_, agg_, op_, dedup_, ...)
    picked = {{}}
    for name in sorted(qs):
        fam = name.split("_", 1)[0]
        picked.setdefault(fam, name)

    out = {{}}
    for fam, name in sorted(picked.items()):
        try:
            out[name] = qs[name](spark, {sf_dir!r}).count()
        except Exception as ex:
            out[name] = f"ERR: {{type(ex).__name__}}: {{ex}}"[:500]
    print("VANILLA_RESULT " + json.dumps(out))
    """
)


def test_every_family_runs_on_bare_session():
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    script = _SCRIPT.format(repo=REPO, sf_dir=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    marker = "VANILLA_RESULT "
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith(marker)), None
    )
    assert line is not None, (
        f"subprocess died before reporting\nstdout:\n{proc.stdout[-2000:]}"
        f"\nstderr:\n{proc.stderr[-2000:]}"
    )
    results = json.loads(line[len(marker):])
    errs = {k: v for k, v in results.items() if isinstance(v, str)}
    assert not errs, f"queries failed on a vanilla session: {errs}"
    assert len(results) >= 10, f"expected >=10 families, got {sorted(results)}"
