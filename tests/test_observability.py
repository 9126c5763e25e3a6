"""Observability plumbing: summary-writer setup behavior.

Reference behaviors matched:
  - run-dir reuse wipes stale event files (``super_resolution.py:474-481``)
    so curves never concatenate across runs;
  - missing tensorboardX warns loudly on stderr instead of silently
    discarding every scalar (a failure mode the reference cannot have —
    it imports tensorboardX unconditionally — but our soft dependency
    must not hide).
"""

import builtins
import os
import sys

from tatt_tpu.train.loop import make_summary_writer


def _block_tensorboardx(monkeypatch):
    real_import = builtins.__import__

    def fake_import(name, *args, **kwargs):
        if name == "tensorboardX":
            raise ImportError("No module named 'tensorboardX'")
        return real_import(name, *args, **kwargs)

    monkeypatch.delitem(sys.modules, "tensorboardX", raising=False)
    monkeypatch.setattr(builtins, "__import__", fake_import)


def test_missing_tensorboardx_warns_on_stderr(monkeypatch, capsys, tmp_path):
    _block_tensorboardx(monkeypatch)
    writer = make_summary_writer(str(tmp_path), "run")
    assert writer is None
    err = capsys.readouterr().err
    assert "tensorboardX" in err and "disabled" in err


def test_dir_reuse_wipes_stale_event_files(monkeypatch, tmp_path):
    run_dir = tmp_path / "run"
    run_dir.mkdir(parents=True)
    stale = run_dir / "events.out.tfevents.123.oldhost"
    stale.write_bytes(b"old")
    # whether or not tensorboardX exists, the stale file must be gone;
    # force the ImportError path only AFTER the wipe would happen by
    # checking both outcomes
    try:
        import tensorboardX  # noqa: F401

        have_tbx = True
    except ImportError:
        have_tbx = False

    writer = make_summary_writer(str(tmp_path), "run")
    if have_tbx:
        assert writer is not None
        assert not stale.exists()
        writer.close()
    else:
        # import failed before the wipe: the stale file remains, but the
        # user was warned (covered by the test above); nothing to assert
        # beyond the None writer
        assert writer is None


def test_dir_reuse_wipe_without_import(monkeypatch, tmp_path):
    """The wipe itself, isolated from the import: simulate tensorboardX
    with a stub module so the wipe path runs everywhere."""
    import types

    stub = types.ModuleType("tensorboardX")

    class _Writer:
        def __init__(self, path):
            self.path = path

        def close(self):
            pass

    stub.SummaryWriter = _Writer
    monkeypatch.setitem(sys.modules, "tensorboardX", stub)

    run_dir = tmp_path / "run"
    run_dir.mkdir(parents=True)
    (run_dir / "events.out.tfevents.1").write_bytes(b"old")
    (run_dir / "events.out.tfevents.2").write_bytes(b"old2")
    sub = run_dir / "subdir"
    sub.mkdir()

    writer = make_summary_writer(str(tmp_path), "run")
    assert writer is not None
    assert os.listdir(run_dir) == ["subdir"]  # files wiped, dirs kept
