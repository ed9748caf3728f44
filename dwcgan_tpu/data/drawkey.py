"""Counter-based RNG keys for deterministic, order-independent data draws.

The torch reference's DataLoader is reproducible: it preserves index order
across worker processes and seeds each worker deterministically, so two
runs of `train.py` with the same seed see the same batches.  A stateful
shared `random.Random` raced by prefetch threads (rounds 1-5 of this
build) is not — run-to-run loss trajectories diverge from step 1 (found by
tools/compare_replica_trail.py while replaying the wiped r5c run).

The TPU-idiomatic fix is the same trick JAX uses for device RNG: make the
stream a pure function of a key instead of hidden state.  Every
augmentation draw is keyed by (dataset seed, per-host salt, epoch, index),
so item content is independent of which worker thread renders it and of
arrival order, and cross-epoch augmentation diversity is preserved.
"""


def draw_key(*vals: int) -> int:
    """Mix integers into a 64-bit key (SplitMix64 finalizer per value).

    Deterministic across processes and Python versions (pure integer
    arithmetic — unlike `hash()`, which PYTHONHASHSEED perturbs for many
    types).  Suitable as a `random.Random` seed.
    """
    h = 0
    for v in vals:
        h = (h ^ (int(v) + 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF
        h = (h * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 31
    return h
