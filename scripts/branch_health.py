"""Per-attack-branch wm_decode health from a channel-mode run's
exp_loss.jsonl (the robust bank's per-branch convergence view used in
the round-3/4 write-ups).

Usage: python scripts/branch_health.py results/<run> [last_n_epochs]
"""

import json
import math
import sys


def main(run_dir: str, last_n: int = 4) -> None:
    lines = [json.loads(l)
             for l in open(f"{run_dir}/exp_loss.jsonl")]
    cfg = json.load(open(f"{run_dir}/exp_config.json"))
    names = cfg.get("robust_attacks") or []
    last_epoch = lines[-1]["epoch"]
    acc: dict = {}
    for l in lines:
        if l["epoch"] > last_epoch - int(last_n) and "attack_idx" in l:
            if not math.isnan(l["wm_decode"]):
                acc.setdefault(int(l["attack_idx"]), []).append(
                    l["wm_decode"])
    print(f"epochs {max(1, last_epoch - int(last_n) + 1)}-{last_epoch}, "
          f"loss {lines[-1]['loss']:.4f}")
    for k in sorted(acc):
        name = names[k] if k < len(names) else f"idx{k}"
        v = acc[k]
        print(f"{name:28s} wm_decode {sum(v) / len(v):.4f}  (n={len(v)})")


if __name__ == "__main__":
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))
