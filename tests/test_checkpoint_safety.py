"""Crash-safety of registry.save_params (staged write + atomic swap).

orbax's ``save(force=True)`` deletes the destination before finalizing, so
a naive save that dies mid-write destroys the *previous* checkpoint too —
which happened repeatedly on this box (wall-clock kills, OOM kills, remote
tunnel wedges) before the staged protocol. These tests pin the protocol's
invariants: an interrupted save never touches the live checkpoint, and a
completed save leaves no staging debris behind.
"""

import os

import numpy as np
import pytest

from vse_tpu.core.registry import load_meta, load_params, save_params

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _tree(v: float):
    return {"w": np.full((4, 3), v, np.float32), "b": np.full((3,), v, np.float32)}


def _assert_tree_value(path, v):
    restored = load_params(path, like=_tree(0.0))
    np.testing.assert_allclose(restored["w"], v)
    np.testing.assert_allclose(restored["b"], v)


def test_save_then_overwrite_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt")
    save_params(_tree(1.0), path, meta={"step": 1})
    _assert_tree_value(path, 1.0)
    assert load_meta(path)["step"] == 1

    save_params(_tree(2.0), path, meta={"step": 2})
    _assert_tree_value(path, 2.0)
    assert load_meta(path)["step"] == 2
    # no staging debris after a clean save
    assert not os.path.exists(path + ".staged")
    assert not os.path.exists(path + ".old")


def test_stale_staging_dir_is_replaced(tmp_path):
    """A .staged left by a previous kill must not break the next save."""
    path = str(tmp_path / "ckpt")
    os.makedirs(path + ".staged")
    with open(os.path.join(path + ".staged", "junk"), "w") as f:
        f.write("partial write from a dead process")
    save_params(_tree(3.0), path, meta={"step": 3})
    _assert_tree_value(path, 3.0)
    assert not os.path.exists(path + ".staged")


def test_interrupted_save_preserves_previous_checkpoint(tmp_path, monkeypatch):
    """Death during the orbax write happens in the staging dir only."""
    path = str(tmp_path / "ckpt")
    save_params(_tree(1.0), path, meta={"step": 1})

    import orbax.checkpoint as ocp

    real_save = ocp.StandardCheckpointer.save

    def dying_save(self, target, *a, **k):
        real_save(self, target, *a, **k)  # bytes land in .staged
        raise KeyboardInterrupt("simulated kill mid-save")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", dying_save)
    with pytest.raises(KeyboardInterrupt):
        save_params(_tree(9.0), path, meta={"step": 9})
    monkeypatch.undo()

    # the live checkpoint is still the step-1 one, fully readable
    _assert_tree_value(path, 1.0)
    assert load_meta(path)["step"] == 1
