"""Versioned parameter snapshots + alias discipline
(shortint/parameters/{v0_10..v1_7} + aliases.rs analog)."""

from tfhe_tpu import shortint
from tfhe_tpu.shortint import params_versions as pv


def test_snapshot_contains_all_v1_4_sets():
    names = set(pv.PARAMETER_VERSIONS["v1_4"])
    assert "PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128" in names
    assert "PARAM_MESSAGE_2_CARRY_2_PBS_KS_GAUSSIAN_2M128" in names
    assert "PARAM_PKE_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128" in names
    assert len(names) >= 15


def test_aliases_point_at_current():
    al = pv.aliases()
    assert (al["PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128"]
            is shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128)
    # module-level materialization (the aliases.rs import surface)
    assert (pv.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
            is shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128)


def test_snapshots_are_immutable():
    import pytest

    with pytest.raises(TypeError):
        pv.PARAMETER_VERSIONS["v1_4"]["X"] = None
    with pytest.raises(TypeError):
        pv.PARAMETER_VERSIONS["v9_9"] = {}
