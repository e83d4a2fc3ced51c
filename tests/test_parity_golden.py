"""Committed golden digest for fp32 generate() on CPU (BASELINE fidelity
contract): the SHA256 of the flagship config's seed-0 init + 2-clip
generate() output must not drift across refactors.

An intentional change to PRNG layout, init, or the generator architecture
legitimately changes this digest — recompute tests/golden/
generate_digest.json deliberately in that commit (the recipe is in the
json's note field), so numeric drift is always an explicit, reviewed
event rather than a silent one. This is the strongest offline stand-in
for the bit-for-bit reference-parity north star: it proves the whole
(seed -> params -> videos) pipeline is frozen."""

import json
import os

import jax

from mocogan_tpu import get_config
from mocogan_tpu.eval import parity
from mocogan_tpu.train import state as train_state

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "generate_digest.json")


def test_generate_digest_matches_golden():
    want = json.load(open(GOLDEN))
    assert jax.default_backend() == want["backend"] == "cpu"
    cfg = get_config(want["config"])
    s = train_state.create(cfg)
    rep = parity.check_determinism(cfg, s.params["gen"], s.bn["gen"],
                                   n=want["n"], seed=want["seed"])
    assert rep["deterministic"] and rep["jit_matches_eager"]
    assert rep["digest"] == want["digest"], (
        "fp32 generate() digest drifted from the committed golden. If this "
        "change is intentional (PRNG/init/architecture), recompute "
        "tests/golden/generate_digest.json in the same commit; otherwise "
        "a refactor silently changed numerics.")
