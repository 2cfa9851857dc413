"""Run the oracle + strict-dtype sweeps over EVERY registered query and
write CORRECTNESS_FULL_r{N}.json — the reproducible record behind the
"all queries pass" claim (ADVICE r3 item 4).

Usage: python tools/full_sweep.py <round-number>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())

    def run(tool: list[str]) -> str:
        return subprocess.run(
            tool, cwd=HERE, capture_output=True, text=True
        ).stdout

    oracle_out = run([sys.executable, "tools/check_correctness.py"])
    oracle_pass = {
        line.split()[1].rstrip(":")
        for line in oracle_out.splitlines()
        if line.startswith(("PASS", "OK?"))
    }
    strict_out = run([sys.executable, "tools/check_types_strict.py", *names])
    strict_pass = {
        line.split(":")[0]
        for line in strict_out.splitlines()
        if line.strip().endswith("PASS")
    }

    queries = {
        n: {"oracle": n in oracle_pass, "strict": n in strict_pass}
        for n in names
    }
    fails = [n for n, v in queries.items() if not (v["oracle"] and v["strict"])]
    artifact = {
        "round": rnd,
        "sf": 0.01,
        "tools": [
            "tools/check_correctness.py (value oracle, normalized)",
            "tools/check_types_strict.py (driver-grade raw dtypes + exact values)",
        ],
        "total_queries": len(names),
        "pass_both": len(names) - len(fails),
        "fail": fails,
        "queries": queries,
    }
    path = os.path.join(HERE, f"CORRECTNESS_FULL_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {path}: {artifact['pass_both']}/{len(names)} pass, fails={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
