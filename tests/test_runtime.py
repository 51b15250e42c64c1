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
    st = eng.run_epochs(it, n_epochs=2)
    assert len(st.epoch_ms) == 2 and st.n_batches == len(it)
    st2 = eng.run_epochs(it, n_epochs=2, resident=True)
    assert len(st2.epoch_ms) == 2
    acc = eng.evaluate(it, ds.labels)
    assert 0.0 <= acc <= 1.0


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


def test_baseline_engine(small):
    ds, it = small
    eng = BaselineEngine(
        feat_dim=it.feat_dim, num_classes=ds.num_classes, model="sage"
    )
    st = eng.run_epochs(it, ds, n_epochs=2)
    assert len(st.epoch_ms) == 2


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
