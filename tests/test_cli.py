"""CLI argument-validation parity (the full CLI happy path is smoked by
the verify recipe; unit tests here cover the reference's input guards)."""


def test_position_validates_inputs(tmp_path):
    """main.go:171-181 parity: bad watermark / non-lake target are
    rejected with a clear error instead of silently touching nothing."""
    import pytest

    from go_mysql_transfer_ray.__main__ import cmd_position

    class A:
        out = str(tmp_path / "nonexistent")
        force_watermark = -5

    with pytest.raises(SystemExit, match="force-watermark"):
        cmd_position(A())
    A.force_watermark = 0
    with pytest.raises(SystemExit, match="no partition manifests"):
        cmd_position(A())
