

def test_lockstep_nan_failure_detection():
    """A non-finite loss must fail fast with model context (SURVEY §5.3 —
    the reference trains on silently until the end)."""
    from types import SimpleNamespace

    import pytest

    from experiments.common import ModelRun

    stub = SimpleNamespace(loss_handle=float("nan"), key="E_dense",
                           n_params=5_000_000, last_loss=0.0)
    with pytest.raises(FloatingPointError, match="E_dense"):
        ModelRun.sync_loss(stub)
    stub2 = SimpleNamespace(loss_handle=1.25, key="A", n_params=1,
                            last_loss=0.0)
    assert ModelRun.sync_loss(stub2) == 1.25
