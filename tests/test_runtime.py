"""Engine + CLI tests (fast CPU path, small synthetic graphs)."""

import numpy as np
import pytest

from qgtc_ppopp22_tpu.graph import ClusterBatcher, synthesize
from qgtc_ppopp22_tpu.runtime import BaselineEngine, QGTCEngine


@pytest.fixture(scope="module")
def small():
    ds = synthesize("Proteins", scale=0.02, seed=5)
    it = ClusterBatcher(
        ds, 4, 2, bit_width=2, bucket_rows=256, shuffle=False
    )
    return ds, it


@pytest.mark.parametrize("fmt", ["digits", "bits"])
def test_engine_formats_agree(small, fmt):
    ds, it = small
    eng = QGTCEngine(
        feat_dim=it.feat_dim,
        num_classes=ds.num_classes,
        bit_width=2,
        fmt=fmt,
        seed=1,
    )
    out = np.asarray(eng.forward_batch(it.batches[0]))
    assert out.shape == (it.batches[0].padded_nodes, ds.num_classes)
    # digits and bits paths share weights derivation from the same
    # float init -> identical quantized weights -> identical logits
    eng2 = QGTCEngine(
        feat_dim=it.feat_dim,
        num_classes=ds.num_classes,
        bit_width=2,
        fmt="digits" if fmt == "bits" else "bits",
        seed=1,
    )
    out2 = np.asarray(eng2.forward_batch(it.batches[0]))
    np.testing.assert_array_equal(out, out2)


def test_engine_zerotile_agrees(small):
    ds, it = small
    kw = dict(
        feat_dim=it.feat_dim, num_classes=ds.num_classes,
        bit_width=2, seed=2,
    )
    dense = QGTCEngine(**kw)
    zt = QGTCEngine(**kw, zerotile_jump=True)
    a = np.asarray(dense.forward_batch(it.batches[0]))
    b = np.asarray(zt.forward_batch(it.batches[0]))
    np.testing.assert_array_equal(a, b)


def test_engine_epochs_and_eval(small):
    ds, it = small
    eng = QGTCEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes, bit_width=2
    )
    st = eng.run_epochs(it, n_epochs=2, sync_every_epoch=True)
    assert len(st.epoch_ms) == 2 and st.n_batches == len(it)
    # reference methodology: one sync at the end -> single amortized avg
    st2 = eng.run_epochs(it, n_epochs=2, resident=True)
    assert len(st2.epoch_ms) == 1 and st2.avg_ms > 0
    acc = eng.evaluate(it, ds.labels)
    assert 0.0 <= acc <= 1.0


def test_engine_fused_and_mega_match_stepwise(small):
    ds, it = small
    eng = QGTCEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes, bit_width=2,
        seed=4,
    )
    ref = np.asarray(eng.forward_batch(it.batches[0]))

    # fused (scan) epoch produces logits for every batch; spot-check
    # the first group's first batch via the mega path too.
    st = eng.run_epochs_fused(it, n_epochs=1)
    assert st.avg_ms > 0
    st = eng.run_epochs_mega(it, n_epochs=1)
    assert st.avg_ms > 0

    # mega output correctness vs per-step path
    import jax, jax.numpy as jnp
    from qgtc_ppopp22_tpu.ops.digits import to_digit_tensor
    from qgtc_ppopp22_tpu.ops.fused_model import fused_model_epoch

    b = it.batches[0]
    a_words = jnp.asarray(b.a_words)  # [1, pn//32, pn] packed adjacency
    x_dg = to_digit_tensor(jax.device_put(b.bit_X)).digits
    out = fused_model_epoch(
        a_words, jnp.asarray(x_dg)[None], tuple(eng.weights), 2,
        model="gcn",
    )
    np.testing.assert_array_equal(
        np.asarray(out[0])[:, : ref.shape[1]], ref
    )


def test_gin_engine(small):
    ds, it = small
    eng = QGTCEngine(
        feat_dim=it.feat_dim,
        num_classes=ds.num_classes,
        model="gin",
        bit_width=2,
    )
    assert eng.cfg.hidden == 64  # reference 0_7b…py:6
    out = np.asarray(eng.forward_batch(it.batches[0]))
    assert out.shape == (it.batches[0].padded_nodes, ds.num_classes)


def test_baseline_engine_precalc(small):
    """--use-pp path: baseline must consume the batcher's augmented
    features (regression: crashed reading dataset.features)."""
    ds, _ = small
    it = ClusterBatcher(
        ds, 4, 2, bit_width=2, bucket_rows=256, precalc=True,
        shuffle=False,
    )
    eng = BaselineEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes, model="sage"
    )
    st = eng.run_epochs(it, ds, n_epochs=1)
    assert st.avg_ms > 0


def test_mega_nonstandard_buckets_and_gin_layers(small):
    """Mega kernel: 256-multiple buckets and 1/2-layer GIN chains."""
    ds, _ = small
    it = ClusterBatcher(ds, 4, 2, bit_width=2, bucket_rows=256,
                        shuffle=False)
    for nl in (1, 2):
        eng = QGTCEngine(
            feat_dim=it.feat_dim, num_classes=ds.num_classes,
            model="gin", bit_width=2, num_layers=nl,
        )
        ref = np.asarray(eng.forward_batch(it.batches[0]))
        st = eng.run_epochs_mega(it, n_epochs=1)
        assert st.avg_ms > 0
        import jax, jax.numpy as jnp
        from qgtc_ppopp22_tpu.ops.digits import to_digit_tensor
        from qgtc_ppopp22_tpu.ops.fused_model import fused_model_epoch

        b = it.batches[0]
        a_words = jnp.asarray(b.a_words)
        x_dg = jnp.asarray(to_digit_tensor(jax.device_put(b.bit_X)).digits)
        out = fused_model_epoch(
            a_words, x_dg[None], tuple(eng.weights), 2, model="gin"
        )
        np.testing.assert_array_equal(
            np.asarray(out[0])[:, : ref.shape[1]], ref
        )


def test_baseline_mega_matches_stepwise(small):
    """fused_baseline_epoch == the per-step bf16 baseline forward."""
    import jax.numpy as jnp

    from qgtc_ppopp22_tpu.ops.fused_model import fused_baseline_epoch

    ds, it = small
    eng = BaselineEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes, model="sage"
    )
    ref = np.asarray(eng.forward_batch(it.batches[0], ds, it.features))
    st = eng.run_epochs_mega(it, ds, n_epochs=1)
    assert st.avg_ms > 0
    b = it.batches[0]
    a, x = eng._dense_cache[
        (b.padded_nodes, b.num_nodes, hash(b.nodes.tobytes()))
    ]
    out = fused_baseline_epoch(
        jnp.asarray(a.astype(np.int8))[None],
        jnp.asarray(x)[None],
        tuple(eng.weights),
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), ref, rtol=1e-5, atol=1e-4
    )


def test_baseline_engine(small):
    ds, it = small
    eng = BaselineEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes, model="sage"
    )
    st = eng.run_epochs(it, ds, n_epochs=2, sync_every_epoch=True)
    assert len(st.epoch_ms) == 2
    st = eng.run_epochs(it, ds, n_epochs=2)
    assert len(st.epoch_ms) == 1 and st.avg_ms > 0


def test_cli_main(small, tmp_path, capsys):
    from qgtc_ppopp22_tpu.cli import main

    rc = main([
        "--dataset", "Proteins", "--dataset-scale", "0.02",
        "--psize", "4", "--batch-size", "2", "--n-epochs", "1",
        "--bit_width", "2", "--use_QGTC", "--cache-dir", str(tmp_path),
        "--json-out", str(tmp_path / "out.jsonl"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Avg. Epoch:" in out
    assert (tmp_path / "out.jsonl").exists()


def test_sparse_engine_matches_sparse_forward(small):
    """SparseEngine == direct sparse_q_forward; evaluate in [0, 1]."""
    import jax.numpy as jnp

    from qgtc_ppopp22_tpu.graph.batching import quantize_np
    from qgtc_ppopp22_tpu.models.sparse import sparse_q_forward
    from qgtc_ppopp22_tpu.runtime import SparseEngine

    ds, _ = small
    eng = SparseEngine(ds, model="gcn", bit_width=2, seed=7)
    got = np.asarray(eng.forward())
    want = np.asarray(
        sparse_q_forward(
            jnp.asarray(ds.graph.indptr),
            jnp.asarray(ds.graph.indices),
            jnp.asarray(quantize_np(ds.features, 2)),
            eng._qws,
            out_bits=2,
            model="gcn",
        )
    )
    np.testing.assert_array_equal(got, want)
    st = eng.run_epochs(2, sync_every_epoch=True)
    assert len(st.epoch_ms) == 2
    assert 0.0 <= eng.evaluate(ds.labels) <= 1.0


def test_cli_sparse_engine(small, tmp_path, capsys):
    """--sparse routes through SparseEngine; unsupported flags warn."""
    from qgtc_ppopp22_tpu.cli import main

    rc = main([
        "--dataset", "Proteins", "--dataset-scale", "0.02",
        "--n-epochs", "1", "--bit_width", "2", "--sparse",
        "--zerotile_jump", "--eval-accuracy",
        "--json-out", str(tmp_path / "sp.jsonl"),
    ])
    assert rc == 0
    cap = capsys.readouterr()
    assert "Avg. Epoch:" in cap.out
    assert "accuracy:" in cap.out
    assert "--zerotile_jump has no effect" in cap.err


def test_ppi_multilabel_f1_end_to_end(tmp_path, capsys):
    """ppi carries multilabels; engines + CLI report micro/macro F1
    (reference calc_f1/evaluate role, utils.py:43-60)."""
    from qgtc_ppopp22_tpu.cli import main

    ds = synthesize("ppi", scale=0.01, seed=3)
    assert ds.multilabels is not None
    assert ds.multilabels.shape == (ds.num_nodes, ds.num_classes)
    it = ClusterBatcher(ds, 4, 2, bit_width=2, bucket_rows=256,
                        shuffle=False)
    eng = QGTCEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes, bit_width=2
    )
    f1 = eng.evaluate_f1(it, ds.multilabels)
    assert 0.0 <= f1["f1_micro"] <= 1.0 and 0.0 <= f1["f1_macro"] <= 1.0

    beng = BaselineEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes, model="sage"
    )
    beng.run_epochs(it, ds, n_epochs=1)
    f1b = beng.evaluate_f1(it, ds, ds.multilabels)
    assert 0.0 <= f1b["f1_micro"] <= 1.0

    rc = main([
        "--dataset", "ppi", "--dataset-scale", "0.01",
        "--psize", "4", "--batch-size", "2", "--n-epochs", "1",
        "--use_QGTC", "--eval-accuracy", "--cache-dir", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "F1-mic:" in out and "F1-mac:" in out


def test_cli_checkpoint_roundtrip(small, tmp_path, capsys):
    """QAT -> save_checkpoint -> CLI --weights end-to-end."""
    import jax

    from qgtc_ppopp22_tpu.cli import main
    from qgtc_ppopp22_tpu.models.qmodels import QModelConfig, init_weights
    from qgtc_ppopp22_tpu.models.train import save_checkpoint

    ds, it = small
    cfg = QModelConfig(it.feat_dim, 16, ds.num_classes, bit_width=2)
    ws = init_weights(jax.random.PRNGKey(21), cfg)
    ck = str(tmp_path / "model.npz")
    save_checkpoint(ck, ws, [1, 2, 1, 2, 1], cfg, model="gcn")

    rc = main([
        "--dataset", "Proteins", "--dataset-scale", "0.02",
        "--psize", "4", "--batch-size", "2", "--n-epochs", "1",
        "--use_QGTC", "--weights", ck, "--eval-accuracy",
        "--cache-dir", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loaded checkpoint: gcn, 2-bit" in out
    assert "accuracy:" in out


def test_engine_mega_resident_compact_smoke(small):
    """run_epochs_mega with --zerotile_jump forced on a resident
    bucket routes through the occupancy-compacted schedule
    (blk_sched); kernel exactness is covered by
    test_signed_mega.test_compact_block_schedule — this checks the
    engine wiring stages and runs."""
    ds, it = small
    eng = QGTCEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes,
        bit_width=2, zerotile_jump=True,
    )
    st = eng.run_epochs_mega(it, n_epochs=1)
    assert st.avg_ms > 0
