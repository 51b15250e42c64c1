"""Compile-probe residency selection for the mega kernel.

``mega_plan_probe`` demotes the hand-tuned VMEM constants of
``mega_vmem_plan`` to a pruning heuristic: on TPU the tier choice is
made by actually lowering the kernel and letting Mosaic accept or
reject it (VERDICT r3 weak #6). These tests drive the tier-fallback
logic with a stubbed compiler.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import qgtc_ppopp22_tpu.ops.fused_model as fm
from qgtc_ppopp22_tpu.ops.digits import digit_pack


def _ws(bits=2, in_dim=100, hidden=16, out=12):
    rng = np.random.default_rng(0)
    dims = [(in_dim, hidden), (hidden, hidden), (hidden, out)]
    return [
        digit_pack(
            jnp.asarray(rng.integers(0, 1 << bits, d), jnp.int32), bits
        )
        for d in dims
    ]


def test_vmem_plan_unpack_once_override():
    ws = _ws()
    ra, uo = fm.mega_vmem_plan(1536, 1, 128, ws)
    assert ra and not uo  # default: resident, no unpack-once (r5
    # re-measured unpack-once as a regression at every bucket)
    ra2, uo2 = fm.mega_vmem_plan(1536, 1, 128, ws, unpack_once=True)
    assert ra2 and uo2  # explicit opt-in still works
    # unpack_once can never be on without a resident A
    ra3, uo3 = fm.mega_vmem_plan(
        1536, 1, 128, ws, resident_a=False, unpack_once=True
    )
    assert not ra3 and not uo3


def test_probe_off_tpu_uses_static_plan():
    ws = _ws()
    fm._PROBE_CACHE.clear()
    pn = 1536
    plan = fm.mega_plan_probe(
        (1, pn // 32, pn), (1, 1, pn, 128), ws, 2
    )
    assert plan == fm.mega_vmem_plan(pn, 1, 128, ws)


def test_probe_tier_fallback_on_vmem_rejection(monkeypatch):
    """Tiers are tried fastest-first; VMEM rejections fall through,
    other errors propagate."""
    ws = _ws()
    pn = 2048
    attempts = []

    class _Stub:
        def __init__(self, fail):
            self.fail = fail

        def lower(self, *shapes):
            return self

        def compile(self):
            attempts.append(1)
            if self.fail:
                raise RuntimeError(
                    "Mosaic failed: scoped vmem limit exceeded"
                )

    fails = [True, False]  # resident tier rejected, stream OK

    def fake_jit(fn):
        return _Stub(fails[len(attempts)])

    monkeypatch.setattr(fm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fm.jax, "jit", fake_jit)
    fm._PROBE_CACHE.clear()
    plan = fm.mega_plan_probe(
        (1, pn // 32, pn), (1, 1, pn, 128), ws, 2
    )
    assert plan == (False, False)
    assert len(attempts) == 2
    # memoized: no further compiles
    plan2 = fm.mega_plan_probe(
        (1, pn // 32, pn), (1, 1, pn, 128), ws, 2
    )
    assert plan2 == plan and len(attempts) == 2
    fm._PROBE_CACHE.clear()


def test_probe_prunes_hopeless_tiers(monkeypatch):
    """At pn where the resident A alone exceeds 1.5x VMEM, the
    resident tiers are never compiled."""
    ws = _ws()
    pn = 16384  # pn^2/8 = 32 MB resident words, 256 MB unpacked
    attempts = []

    class _Stub:
        def lower(self, *shapes):
            return self

        def compile(self):
            attempts.append(1)

    monkeypatch.setattr(fm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fm.jax, "jit", lambda fn: _Stub())
    fm._PROBE_CACHE.clear()
    plan = fm.mega_plan_probe(
        (1, pn // 32, pn), (1, 1, pn, 128), ws, 2
    )
    assert plan == (False, False)
    assert len(attempts) == 1  # only the streaming tier compiled
    fm._PROBE_CACHE.clear()


def test_probe_propagates_non_vmem_errors(monkeypatch):
    ws = _ws()
    pn = 1536

    class _Stub:
        def lower(self, *shapes):
            return self

        def compile(self):
            raise RuntimeError("unrelated lowering bug")

    monkeypatch.setattr(fm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fm.jax, "jit", lambda fn: _Stub())
    fm._PROBE_CACHE.clear()
    with pytest.raises(RuntimeError, match="unrelated"):
        fm.mega_plan_probe((1, pn // 32, pn), (1, 1, pn, 128), ws, 2)
    fm._PROBE_CACHE.clear()
