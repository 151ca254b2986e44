"""Every registered query with an oracle, compared against DuckDB at
sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from kinesis2sse_spark.registry import all_oracles
from tests.conftest import SF_CORRECTNESS, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_matches_oracle(spark, name):
    assert_matches_oracle(spark, name, SF_CORRECTNESS)
