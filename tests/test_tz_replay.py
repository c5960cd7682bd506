"""Full-registry gate replay under a NON-UTC session time zone.

README claims every registered query's result is independent of the
driver session's time zone (the engine's NTZ + zone-pure epoch-arithmetic
policy). This test makes that claim mechanical: it re-runs the ENTIRE
oracle-parity gate with ``spark.sql.session.timeZone`` pinned to
America/New_York (runtime-settable, restored afterwards).

Gated behind SPARK_GRAFT_TZ_REPLAY=1 because it duplicates the ~5-minute
parity suite; run it before any release that touches timestamp handling:

    SPARK_GRAFT_TZ_REPLAY=1 python -m pytest tests/test_tz_replay.py -q
"""

from __future__ import annotations

import os

import pytest

from atlas_migration_repo_spark.registry import QUERIES

from conftest import SF_DIR, assert_matches_oracle

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_TZ_REPLAY"),
    reason="set SPARK_GRAFT_TZ_REPLAY=1 to run the non-UTC full-registry replay",
)


@pytest.fixture(scope="module")
def tz_pinned(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_zone_independent(tz_pinned, oracle_con, name):
    qd = QUERIES[name]
    if qd.oracle is None:
        df = qd.fn(tz_pinned, SF_DIR)
        assert df.count() >= 0
        return
    assert_matches_oracle(tz_pinned, oracle_con, qd)
