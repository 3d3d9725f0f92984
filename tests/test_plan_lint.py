"""Catalog-wide plan lint as a regression gate: no NEW global-window /
cartesian / row-Python-UDF sites may appear (scripts/plan_lint.py is the
standalone form; this imports its logic so there is one source of
truth)."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "plan_lint",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_lint.py"),
)
plan_lint = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(plan_lint)


def test_no_new_scale_antipatterns_in_catalog(catalog_plans):
    import re

    bad = []
    for name, (plan, _) in catalog_plans.items():
        findings = []
        for s in re.findall(r"windowspecdefinition\((.*?)\) AS ", plan):
            head = s.split("specifiedwindowframe")[0]
            args = [a.strip() for a in head.split(",") if a.strip()]
            if not any(" ASC" not in a and " DESC" not in a for a in args):
                findings.append("global-window")
        if "CartesianProduct" in plan:
            findings.append("cartesian")
        if "BatchEvalPython" in plan:
            findings.append("row-python-udf")
        findings = sorted(set(findings))
        if findings == ["global-window"] and name in plan_lint.GLOBAL_WINDOW_OK:
            continue
        if findings:
            bad.append((name, findings))
    assert not bad, f"scale anti-patterns appeared: {bad}"
