"""Golden-fixture parity walks shared by the TPU gates.

The RTM streaming fast paths (folded attention, weight-only-int8 fold,
s2d-packed stem — models/rtm.fold_stream_weights) are selected by recorded
measurement but gated on argmax parity against the frozen reference logits.
Both gates (tools/tpu_checklist.py at release check time, and
tools/bench_latency.py --record at selection time) walk the same fixtures
through this helper so they cannot drift apart.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Sequence, Tuple, Union

# Max tolerated logit drift for a compressed PMG head variant to be
# selectable/releasable: well above the measured bf16/q8 drift (~6e-3 on
# the shipped fixture at TPU fast precision) and well below any logit gap
# that could move a calibrated probability meaningfully.  BOTH gate
# consumers (tools/bench_latency.py --record and tools/tpu_checklist.py)
# enforce it next to the argmax check.
HEAD_FOLD_MAX_DRIFT = 0.05


def pmg_head_fold_fixture_parity(
    fixtures_dir: str, variants: Union[str, Sequence[str]]
) -> Union[List[Tuple[str, bool, float]],
           Dict[str, List[Tuple[str, bool, float]]]]:
    """Run the PMG head with ``fold_head_weights`` weights on every PMG
    golden fixture and compare against the frozen reference logits.

    ``variants`` (one name or a sequence — the fixture checkpoints load and
    the trunk->gram-token computation runs ONCE per fixture either way):
    "bf16" / "q8" run the XLA fold path (models/pmg.head_from_gram_tokens);
    "pallas_bf16" / "pallas_q8" run the fused head kernel
    (ops/pallas_kernels.fused_head — interpret mode off TPU) on the same
    folded tree.  The token computation is the exact XLA path in all cases
    (at the caller's matmul precision), so drift beyond that precision's
    noise isolates the head compression/kernel.

    The argmax gate skips samples whose REFERENCE top-2 logit margin is
    below 1e-3: such decisions sit inside f32 reassociation noise and flip
    under any precision change (the frozen pmg_no_transformer fixture has
    one at a 1e-4 margin), so they carry no signal about the compression.
    Magnitude errors on every sample (near-ties included) are covered by
    the drift value, which gate consumers bound with
    :data:`HEAD_FOLD_MAX_DRIFT`.  Returns [(fixture_name,
    argmax_matches_on_decisive_samples, max_logit_drift)] for a single
    variant name, or {variant: rows} for a sequence.
    """
    _TIE_MARGIN = 1e-3
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..engine import checkpoint
    from ..models import pmg
    from ..ops.gram import patch_gram_tokens
    from ..ops.nn import conv2d, se_block

    single = isinstance(variants, str)
    todo = [variants] if single else list(variants)
    interpret = jax.devices()[0].platform.lower() not in ("tpu", "axon")
    out: Dict[str, List[Tuple[str, bool, float]]] = {v: [] for v in todo}
    for jf in sorted(glob.glob(os.path.join(fixtures_dir, "pmg_*.json"))):
        name = os.path.splitext(os.path.basename(jf))[0]
        with open(jf) as f:
            meta = json.load(f)
        spec = pmg.build_spec(meta["tasks"], meta["hparams"])
        params = checkpoint.load_torch_checkpoint(
            "pmg", os.path.join(fixtures_dir, f"{name}.pth"), spec
        )
        data = np.load(os.path.join(fixtures_dir, f"{name}.npz"))
        x = jnp.asarray(np.transpose(data["input"], (0, 2, 3, 1)))
        feats = pmg.apply_trunk(params["trunk"], x, spec.plan, spec.norm)
        h = se_block(feats, params["se"]) if spec.use_channel_attention else feats
        tokens = patch_gram_tokens(conv2d(h, params["chan_proj"]), spec.patch_div)
        folds: Dict[str, dict] = {}
        for variant in todo:
            use_pallas = variant.startswith("pallas_")
            fv = variant[len("pallas_"):] if use_pallas else variant
            if fv not in folds:
                folds[fv] = pmg.fold_head_weights(params, spec, fv)
            if use_pallas:
                from ..ops.pallas_kernels import fused_head

                lg = np.asarray(
                    fused_head(tokens, folds[fv], spec, interpret=interpret),
                    np.float32,
                )
            else:
                lg = np.asarray(
                    pmg.head_from_gram_tokens(folds[fv], tokens, spec),
                    np.float32,
                )
            agree, drift = True, 0.0
            for i, task in enumerate(spec.tasks.names):
                want = data[f"logits/{task}"]
                got = lg[:, i, : want.shape[1]]
                top2 = np.sort(want, axis=-1)
                decisive = (top2[:, -1] - top2[:, -2]) >= _TIE_MARGIN
                agree &= bool(
                    (got.argmax(-1) == want.argmax(-1))[decisive].all()
                )
                drift = max(drift, float(np.abs(got - want).max()))
            out[variant].append((name, agree, drift))
    return out[todo[0]] if single else out


def rtm_stream_fixture_parity(
    fixtures_dir: str, dtype, **fold_kwargs
) -> List[Tuple[str, bool, float]]:
    """Run ``rtm.apply_stream`` on every attention RTM golden fixture with
    ``fold_stream_weights(dtype=dtype, **fold_kwargs)`` weights.

    Returns [(fixture_name, argmax_matches, max_logit_drift)] vs the frozen
    reference logits (tests/fixtures/rtm_*.npz, generated by running the
    PyTorch reference — tools/make_fixtures.py).
    """
    import jax.numpy as jnp
    import numpy as np

    from ..engine import checkpoint
    from ..models import rtm

    out: List[Tuple[str, bool, float]] = []
    for jf in sorted(glob.glob(os.path.join(fixtures_dir, "rtm_*.json"))):
        name = os.path.splitext(os.path.basename(jf))[0]
        with open(jf) as f:
            meta = json.load(f)
        spec = rtm.build_spec(meta["tasks"], meta["hparams"])
        if not spec.use_attention:
            continue
        params = checkpoint.load_torch_checkpoint(
            "rtm", os.path.join(fixtures_dir, f"{name}.pth"), spec
        )
        data = np.load(os.path.join(fixtures_dir, f"{name}.npz"))
        x = np.transpose(data["input"], (0, 2, 3, 1))  # NCHW f32 -> NHWC
        folded = rtm.fold_stream_weights(params, spec, dtype=dtype, **fold_kwargs)
        lg = np.asarray(
            rtm.apply_stream(folded, jnp.asarray(x, dtype), spec), np.float32
        )
        agree, drift = True, 0.0
        for i, task in enumerate(spec.tasks.names):
            want = data[f"logits/{task}"]
            got = lg[:, i, : want.shape[1]]
            agree &= bool((got.argmax(-1) == want.argmax(-1)).all())
            drift = max(drift, float(np.abs(got - want).max()))
        out.append((name, agree, drift))
    return out
