"""Cross-check the r5d replica run against the recovered r5c loss trail.

The r5c 50k run (resumed through three checkpoint boundaries: 8k, 14k, 20k)
was wiped by a VM reset before its long-horizon eval; its loss trail was
recovered from git snapshot history (quality/r5/r5c_loss_trail_recovered.txt).
The r5d session replays the trajectory 0->50k in ONE straight run under
mathematically identical config/seed (configs/celeba_quality_r5d.yaml).

Comparing same-step (gen, dis) losses between the two is therefore an
end-to-end check of two headline claims at once:

  * deterministic data/step pipeline — same seed => same batches => same math;
  * lossless resume — the original trajectory crossed three resume
    boundaries; if resume dropped or replayed even one optimizer step or
    data batch, every post-resume loss would diverge from the straight run.

MEASURED ANSWER (2026-08-19): they do NOT match, from the very first
common step — and neither do the two r4 q8k attempts at step 100. Root
cause found in the pipeline, not in resume: prefetch threads raced the
output queue (batch order) and the shared augmentation RNG (item
content), so same-seed runs of rounds 1-5 were never bitwise-reproducible
(the torch reference's order-preserving DataLoader IS). Fixed via
order-preserving prefetch + (seed, salt, epoch, index)-keyed draws
(data/drawkey.py, tests/test_pipeline_determinism.py); runs launched
after the fix replicate at the data-stream level. The r5d replica
(launched before the fix) is a fresh same-seed sample of the same
training distribution.

Usage: python tools/compare_replica_trail.py [replica_log] [recovered_trail]
Writes a table to stdout; exit 0 always (reporting tool, not a gate).
"""

import re
import sys

ROW = re.compile(
    r"^Iteration: (\d+)/\d+ gen ([\d.ein+-]+) dis ([\d.ein+-]+) ")


def parse(path):
    rows = {}
    with open(path) as f:
        for line in f:
            m = ROW.match(line)
            if m:
                rows[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return rows


def main():
    replica_log = sys.argv[1] if len(sys.argv) > 1 else "runs/q5d_train.log"
    trail = (sys.argv[2] if len(sys.argv) > 2
             else "quality/r5/r5c_loss_trail_recovered.txt")
    a = parse(replica_log)
    b = parse(trail)
    common = sorted(set(a) & set(b))
    if not common:
        print("no common steps yet (replica at "
              f"{max(a) if a else 0}, trail starts at {min(b) if b else '-'})")
        return
    print(f"common steps: {len(common)} ({common[0]}..{common[-1]})")
    print("step   | gen r5d  gen r5c  |dgen|   | dis r5d  dis r5c  |ddis|")
    n_match = 0
    for s in common:
        ga, da = a[s]
        gb, db = b[s]
        dg, dd = abs(ga - gb), abs(da - db)
        if dg < 5e-4 and dd < 5e-4:
            n_match += 1
        # print a sparse view: every 10th common step plus any near-match
        if s % 1000 == 0 or (dg < 5e-4 and dd < 5e-4 and s % 500 == 0):
            print(f"{s:6d} | {ga:8.4f} {gb:8.4f} {dg:7.4f} | "
                  f"{da:8.4f} {db:8.4f} {dd:7.4f}")
    print(f"same-step rows matching to <5e-4 on both losses: "
          f"{n_match}/{len(common)}")


if __name__ == "__main__":
    main()
