"""Checkpoint backends: native msgpack container and the orbax option.

The lifecycle itself (best/latest, resume-restores-step) is covered by the
e2e train tests; these pin the storage layer — round-trips, format sniffing
(native file / orbax dir / torch pickle all through one ``load_checkpoint``),
and repeated-overwrite of ``latest`` which the train loop does every
validation (reference lifecycle per SURVEY.md 2.3/3.5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from end_to_end_asr_pytorch_tpu.utils.checkpoint import (load_checkpoint,
                                                         save_checkpoint)


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "enc": {"w": jax.random.normal(k, (8, 16), jnp.float32),
                "b": jnp.zeros((16,), jnp.bfloat16)},
        "dec": {"emb": jax.random.normal(k, (32, 8), jnp.float32)},
    }


def _zeros_like_tree(t):
    return jax.tree.map(lambda x: jnp.zeros_like(x), t)


def _assert_tree_equal(a, b):
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x, np.float32), np.asarray(y, np.float32)), a, b)


@pytest.mark.parametrize("fmt", ["native", "orbax"])
def test_roundtrip_model_opt_step_metrics(tmp_path, fmt):
    params = _tree()
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = tmp_path / "latest.pth"
    save_checkpoint(path, params, opt_state, global_step=1234,
                    metrics={"wer": 0.125}, fmt=fmt)
    out = load_checkpoint(path, _zeros_like_tree(params),
                          opt.init(_zeros_like_tree(params)))
    assert out["global_step"] == 1234
    assert out["metrics"] == {"wer": 0.125}
    _assert_tree_equal(out["model"], params)
    assert jax.tree.structure(out["optimizer"]) == \
        jax.tree.structure(opt_state)
    _assert_tree_equal(out["optimizer"], opt_state)
    # dtypes survive (bf16 leaf stays bf16)
    assert out["model"]["enc"]["b"].dtype == jnp.bfloat16


@pytest.mark.parametrize("fmt", ["native", "orbax"])
def test_model_only_load_and_overwrite(tmp_path, fmt):
    """Test-mode load (no optimizer template) + latest.pth overwritten the
    way the train loop does every validation pass."""
    path = tmp_path / "latest.pth"
    for step in (100, 200):
        save_checkpoint(path, _tree(step), None, global_step=step, fmt=fmt)
    out = load_checkpoint(path, _zeros_like_tree(_tree()))
    assert out["global_step"] == 200
    assert out["optimizer"] is None
    _assert_tree_equal(out["model"], _tree(200))


def test_orbax_overwrites_native_file(tmp_path):
    """Switching ckpt_format mid-experiment replaces the old single-file
    checkpoint with the orbax dir (and the sniffing load reads both)."""
    path = tmp_path / "latest.pth"
    save_checkpoint(path, _tree(1), None, global_step=1, fmt="native")
    assert path.is_file()
    save_checkpoint(path, _tree(2), None, global_step=2, fmt="orbax")
    assert path.is_dir()
    out = load_checkpoint(path, _zeros_like_tree(_tree()))
    assert out["global_step"] == 2
    _assert_tree_equal(out["model"], _tree(2))


def test_unknown_format_rejected(tmp_path):
    with pytest.raises(ValueError, match="ckpt_format"):
        save_checkpoint(tmp_path / "x.pth", _tree(), fmt="safetensors")


def test_solver_rejects_bad_ckpt_format_at_init(tmp_path):
    """ADVICE r4: a ckpt_format typo must fail at startup, not at the first
    validation save hours into the run."""
    from end_to_end_asr_pytorch_tpu.solvers.base import BaseSolver

    class P:
        config = "exp.yaml"; name = None; seed = 0
        logdir = str(tmp_path / "log"); ckpdir = str(tmp_path / "ckpt")
        outdir = str(tmp_path / "out"); no_msg = True

    with pytest.raises(ValueError, match="ckpt_format"):
        BaseSolver({"ckpt_format": "orbx"}, P(), "train")


@pytest.mark.parametrize("crash_window", ["after_rename_aside",
                                          "mid_tmp_write"])
def test_orbax_preemption_recovery(tmp_path, crash_window):
    """ADVICE r4: the orbax overwrite renames the old dir aside before
    promoting the new one; a preemption in either window must still leave a
    checkpoint that load_checkpoint finds (by promoting the complete
    sibling), with no manual rename."""
    path = tmp_path / "latest.pth"
    save_checkpoint(path, _tree(1), None, global_step=1, fmt="orbax")
    save_checkpoint(path, _tree(2), None, global_step=2, fmt="orbax")
    if crash_window == "after_rename_aside":
        # simulate dying between path.rename(old) and tmp.replace(path):
        # .old = step-2 ckpt, .tmp = a COMPLETE step-3 save
        import shutil
        shutil.copytree(path, tmp_path / "latest.pth.tmp")
        meta = (tmp_path / "latest.pth.tmp" / "meta.json")
        meta.write_text(meta.read_text().replace('"global_step": 2',
                                                 '"global_step": 3'))
        path.rename(tmp_path / "latest.pth.old")
        expect_step = 3          # the newer complete sibling wins
    else:
        # simulate dying mid-save BEFORE meta.json landed: .tmp incomplete
        # (no meta.json => skipped), .old holds the previous checkpoint
        (tmp_path / "latest.pth.tmp").mkdir()
        (tmp_path / "latest.pth.tmp" / "model").mkdir()
        path.rename(tmp_path / "latest.pth.old")
        expect_step = 2
    out = load_checkpoint(path, _zeros_like_tree(_tree()))
    assert out["global_step"] == expect_step
    assert path.is_dir()         # the sibling was promoted back in place


def test_solver_reads_ckpt_format_knob(tmp_path):
    from end_to_end_asr_pytorch_tpu.solvers.base import BaseSolver

    class P:
        config = "exp.yaml"; name = None; seed = 0
        logdir = str(tmp_path / "log"); ckpdir = str(tmp_path / "ckpt")
        outdir = str(tmp_path / "out"); no_msg = True

    s = BaseSolver({"ckpt_format": "orbax"}, P(), "train")
    assert s.ckpt_format == "orbax"
    s2 = BaseSolver({}, P(), "train")
    assert s2.ckpt_format == "native"
