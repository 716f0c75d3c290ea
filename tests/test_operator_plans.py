"""Operator-level plan audit (round-9 verdict #1): every public
pair-generating operator, called with DEFAULT arguments, must plan
without a CartesianProduct — or refuse to plan at all. The registry
audit (tools/plan_audit.py over PLANS.md) proves this for registered
queries; this proves it for the raw library API a user calls
directly. Shares the exact check implementation with the tool, so the
two cannot drift."""

import io
import os
import sys
from contextlib import redirect_stdout

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.plan_audit import OPERATOR_PLANS, run_plan_checks  # noqa: E402


@pytest.mark.parametrize("name", sorted(OPERATOR_PLANS))
def test_operator_default_plan_is_scale_safe(spark, name):
    claim, allowed, builder = OPERATOR_PLANS[name]
    df = builder(spark)
    if df is None:
        return  # refuse-to-plan contract asserted inside the builder
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    checks, failures = run_plan_checks(buf.getvalue(), allowed)
    assert failures == 0, f"{name}: {claim}\n" + "\n".join(checks)
