"""Fill docs/round5_demo/README.md ``<!-- TABLE:<name> -->`` placeholders
with the rendered markdown table for ``results/<name>/results.csv`` (and
copy the run directory into the demo folder so the evidence is durable —
results/ is gitignored and VM restarts have wiped it twice).

Usage: python scripts/r5_fill_readme.py [name ...]
Default: every placeholder still present in the README.
"""

from __future__ import annotations

import io
import os
import re
import shutil
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(__file__))
import sweep_to_md  # noqa: E402

README = "docs/round5_demo/README.md"
DEMO = "docs/round5_demo"
SPLITS = {"eval_r5_train": "train"}   # non-test-split runs


def render(name: str) -> str:
    csv_path = f"results/{name}/results.csv"
    buf = io.StringIO()
    with redirect_stdout(buf):
        sweep_to_md.main(csv_path, SPLITS.get(name, "test"))
    return buf.getvalue().rstrip()


def main(names):
    with open(README) as f:
        text = f.read()
    for name in names:
        tag = f"<!-- TABLE:{name} -->"
        if tag not in text:
            print(f"skip {name}: no placeholder")
            continue
        if not os.path.exists(f"results/{name}/results.csv"):
            print(f"skip {name}: results not ready")
            continue
        text = text.replace(tag, render(name))
        dst = os.path.join(DEMO, name)
        if not os.path.exists(dst):
            shutil.copytree(f"results/{name}", dst,
                            ignore=shutil.ignore_patterns("artifacts"))
        print(f"filled {name} (+ copied to {dst})")
    with open(README, "w") as f:
        f.write(text)


if __name__ == "__main__":
    names = sys.argv[1:] or re.findall(
        r"<!-- TABLE:(\S+) -->", open(README).read())
    main(names)
