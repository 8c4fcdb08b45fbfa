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

    with pytest.raises(ValueError, match="remat_progression"):
        TrainConfig(
            batch_progression=(4, 4), epoch_progression=(1, 1),
            remat_progression=(True,),
        )


def test_progression_length_mismatch_fails_at_construction(tmp_path):
    """A batch_progression shorter than epoch_progression must error at
    config construction — not IndexError at the final stage boundary hours
    into a run (the reference's latent bug, train.py:33-38)."""
    import pytest

    from byogan_tpu.train.config import TrainConfig, load_ini_config

    with pytest.raises(ValueError, match="batch_progression"):
        TrainConfig(batch_progression=(4, 4), epoch_progression=(1, 1, 1))
    # equal or longer is fine (extra batch entries are simply unused)
    TrainConfig(batch_progression=(4, 4, 4, 4), epoch_progression=(1, 1, 1))

    # the INI loader names the file and section in its error
    ini = tmp_path / "config.txt"
    ini.write_text(
        "[DEFAULT]\nbatch_progression = 4,4\nepoch_progression = 1,1,1\n"
        "[demo]\n"
    )
    with pytest.raises(ValueError, match=r"config\.txt \[demo\]"):
        load_ini_config(str(ini), "demo")
