#!/usr/bin/env python
"""On-chip test artifact (VERDICT r4 item 6): run the TPU-marked kernel
parity tests on the real chip (WOL_TEST_TPU=1 leaves the ambient backend in
place — tests/conftest.py) plus the kernel smoke sweep, and write pass/fail
counts to TPUTESTS_r{N}.json at the repo root (committed, like BENCH).

Usage: python scripts/run_tpu_tests.py [round_tag] [extra pytest args]
"""
import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FILES = ["tests/test_pallas_kernels.py", "tests/test_voronoi_device.py"]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    xml_path = "/tmp/tputests.xml"
    env = dict(os.environ, WOL_TEST_TPU="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *FILES, "-q", "-rf",
         f"--junitxml={xml_path}", *sys.argv[2:]],
        cwd=REPO, env=env, capture_output=True, text=True,
        timeout=3 * 3600,
    )
    wall = time.time() - t0
    result = {
        "round": tag,
        "files": FILES,
        "rc": proc.returncode,
        "wall_s": round(wall, 1),
        "platform_env": "WOL_TEST_TPU=1 (ambient TPU backend)",
    }
    try:
        suite = ET.parse(xml_path).getroot().find("testsuite")
        result.update(
            tests=int(suite.get("tests", 0)),
            failures=int(suite.get("failures", 0)),
            errors=int(suite.get("errors", 0)),
            skipped=int(suite.get("skipped", 0)),
        )
        result["passed"] = (
            result["tests"] - result["failures"] - result["errors"]
            - result["skipped"]
        )
        failed = [
            f"{tc.get('classname')}::{tc.get('name')}"
            for tc in suite.iter("testcase")
            if tc.find("failure") is not None or tc.find("error") is not None
        ]
        if failed:
            result["failed_tests"] = failed
    except Exception as e:  # noqa: BLE001 — record the parse failure
        result["junit_parse_error"] = f"{type(e).__name__}: {e}"
        result["stdout_tail"] = proc.stdout[-2000:]

    # kernel smoke sweep (small-shape compile/run of every kernel)
    try:
        smoke = subprocess.run(
            [sys.executable, "scripts/tpu_smoke_kernels.py"],
            cwd=REPO, capture_output=True, text=True, timeout=2400,
        )
        result["smoke_rc"] = smoke.returncode
        result["smoke_tail"] = (smoke.stdout or smoke.stderr)[-800:]
    except Exception as e:  # noqa: BLE001
        result["smoke_rc"] = -1
        result["smoke_tail"] = f"{type(e).__name__}: {e}"

    out_path = os.path.join(REPO, f"TPUTESTS_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    return 0 if proc.returncode == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
