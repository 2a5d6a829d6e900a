"""Regenerate BENCH/plans_pinned.json — the committed plan-shape pins that
tests/test_plan_pins.py asserts against (r5, VERDICT r4 task 6).

Run ONLY after an intentional plan change, then review the diff: a pin
that moved is a physical-plan shape change (new exchange, lost broadcast,
different join strategy) and must be explainable in the commit message.

Usage: python tools/pin_plans.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as contract
    from angola_erp_ocr_spark.planpin import (PIN_FILE, PINNED_QUERIES,
                                              normalized_plan, plan_digest)
    from angola_erp_ocr_spark.session import get_spark

    # the tests' standard session config — plan shape depends on it
    spark = get_spark(app_name="pin_plans", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    pins, plans = {}, {}
    for name in PINNED_QUERIES:
        df = qs[name](spark, sf_dir)
        pins[name] = plan_digest(df)
        plans[name] = normalized_plan(df)
        print(f"{name}: {pins[name]}")
    out = {"session": "local[8] shuffle_partitions=8",
           "sf_dir_used": sf_dir,
           "digests": pins}
    with open(os.path.join(REPO, PIN_FILE), "w") as f:
        json.dump(out, f, indent=1)
    # full normalized plans for diffing when a pin moves (not asserted on)
    with open(os.path.join(REPO, "BENCH", "plans_pinned_full.json"), "w") as f:
        json.dump(plans, f, indent=1)
    spark.stop()
    print(f"wrote {PIN_FILE}")


if __name__ == "__main__":
    main()
