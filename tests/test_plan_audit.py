"""The mechanized 'would this survive 100×?' check (tools/audit_plans.py)
run in-process: every audited headliner's physical plan must satisfy its
declared scale invariants (pushdown, broadcast, shuffle budget, codegen,
no Python UDFs in hot paths)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_plan_invariants_hold(spark):
    import audit_plans

    sf = "/root/testdata/sf0.001"
    for name, (builder, rules) in audit_plans.audited_queries().items():
        df = builder(spark, sf)
        plan = audit_plans.plan_of(df)
        cg = rules.pop("codegen", False)
        errs = audit_plans.check(name, plan, rules)
        if cg:
            import re

            final = audit_plans.final_plan_of(df)
            if not re.search(r"\*\(\d+\)", final):
                errs.append("no codegen span")
        assert not errs, f"{name}: {errs}"
