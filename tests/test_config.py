"""Config surface tests: INI progression parsing and per-stage lookups."""


def test_remat_progression_parse_and_stage_lookup():
    from byogan_tpu.train.config import TrainConfig, config_from_mapping

    c = config_from_mapping({
        "batch_progression": "4,4,4",
        "epoch_progression": "1,1,1",
        "remat_progression": "False,True,False",
    })
    assert c.remat_progression == (False, True, False)
    assert [c.stage_remat(i) for i in range(3)] == [False, True, False]
    # absent -> global remat everywhere
    c2 = config_from_mapping({
        "batch_progression": "4,4", "epoch_progression": "1,1",
        "remat": "True",
    })
    assert c2.remat_progression is None
    assert [c2.stage_remat(i) for i in range(2)] == [True, True]
    # length mismatch is a clear error
    import pytest

    bad = TrainConfig(
        batch_progression=(4, 4), epoch_progression=(1, 1),
        remat_progression=(True,),
    )
    with pytest.raises(ValueError, match="remat_progression"):
        bad.stage_remat(0)
