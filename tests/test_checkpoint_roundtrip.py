"""Round-trip: reference .pth -> pytree -> exported state dict must equal the
original tensors bit-for-bit (checkpoint-fidelity gate, BASELINE.md), for all
three families and every fixture config."""

import json
import os

import numpy as np
import pytest

from tests.conftest import FIXTURES

import wadt  # noqa: F401
from wadt.engine import checkpoint
from wadt.models import get_family

CASES = sorted(
    os.path.splitext(f)[0] for f in os.listdir(FIXTURES) if f.endswith(".json")
)

# Keys that legitimately do not round-trip:
# - num_batches_tracked: training bookkeeping, re-emitted as 0
# - RTM raw-name backbones get re-exported under truncated_encoder.<seq>
SKIP_SUBSTR = ("num_batches_tracked",)


@pytest.mark.parametrize("name", CASES)
def test_roundtrip_bitexact(name):
    with open(os.path.join(FIXTURES, f"{name}.json")) as f:
        meta = json.load(f)
    mod = get_family(meta["family"])
    spec = mod.build_spec(meta["tasks"], meta["hparams"])
    orig = checkpoint.load_state_dict(os.path.join(FIXTURES, f"{name}.pth"))
    params = checkpoint.convert(meta["family"], orig, spec)
    exported = checkpoint.export_state_dict(meta["family"], params, spec)

    missing = [
        k for k in orig
        if k not in exported and not any(s in k for s in SKIP_SUBSTR)
    ]
    assert not missing, f"keys lost in round-trip: {missing[:10]}"
    for k, v in exported.items():
        if any(s in k for s in SKIP_SUBSTR):
            continue
        assert k in orig, f"exported unknown key {k}"
        np.testing.assert_array_equal(
            v.astype(np.float32), orig[k].astype(np.float32), err_msg=f"{name}/{k}"
        )


def test_exported_pth_reloads(tmp_path):
    """Exported .pth goes back through the forward converter to identical
    logits (full cycle through torch serialization)."""
    name = "pmg_tiny_instance_se"
    with open(os.path.join(FIXTURES, f"{name}.json")) as f:
        meta = json.load(f)
    mod = get_family("pmg")
    spec = mod.build_spec(meta["tasks"], meta["hparams"])
    params = checkpoint.load_torch_checkpoint(
        "pmg", os.path.join(FIXTURES, f"{name}.pth"), spec
    )
    out = str(tmp_path / "exported.pth")
    checkpoint.save_torch_checkpoint("pmg", params, spec, out)
    params2 = checkpoint.load_torch_checkpoint("pmg", out, spec)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    la, _ = mod.apply(params, x, spec)
    lb, _ = mod.apply(params2, x, spec)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
