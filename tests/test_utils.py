import numpy as np

from orcai_tpu.utils.rle import (
    find_consecutive_ones,
    runs_from_binary_matrix,
    seconds_to_hms,
)
from orcai_tpu.utils.seeds import rng_for, shuffle_seed_from


def test_find_consecutive_ones_basic():
    v = np.array([0, 1, 1, 0, 1, 0, 0, 1, 1, 1])
    starts, stops = find_consecutive_ones(v)
    np.testing.assert_array_equal(starts, [1, 4, 7])
    np.testing.assert_array_equal(stops, [2, 4, 9])


def test_find_consecutive_ones_edges():
    starts, stops = find_consecutive_ones(np.array([1, 1, 0, 0, 1]))
    np.testing.assert_array_equal(starts, [0, 4])
    np.testing.assert_array_equal(stops, [1, 4])
    starts, stops = find_consecutive_ones(np.zeros(5, dtype=int))
    assert len(starts) == 0 and len(stops) == 0
    starts, stops = find_consecutive_ones(np.ones(5, dtype=int))
    np.testing.assert_array_equal(starts, [0])
    np.testing.assert_array_equal(stops, [4])


def test_runs_from_binary_matrix():
    m = np.array([[1, 0], [1, 0], [0, 1], [0, 0]])
    starts, stops, names = runs_from_binary_matrix(m, ["A", "B"])
    assert starts == [0, 2]
    assert stops == [1, 2]
    assert names == ["A", "B"]


def test_seconds_to_hms():
    assert seconds_to_hms(3661) == "01:01:01"
    assert seconds_to_hms(0) == "00:00:00"


def test_rng_for_deterministic():
    a = rng_for(1, 123456789).uniform(size=5)
    b = rng_for(1, 123456789).uniform(size=5)
    c = rng_for(2, 123456789).uniform(size=5)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # matches the reference's composition np.random.default_rng([id, seed])
    ref = np.random.default_rng([1, 123456789]).uniform(size=5)
    np.testing.assert_array_equal(a, ref)


def test_shuffle_seed_from():
    s1 = shuffle_seed_from([7, 42])
    s2 = shuffle_seed_from([7, 42])
    assert s1 == s2
    assert isinstance(s1, int)
    ref = int(np.random.SeedSequence([7, 42]).generate_state(1)[0])
    assert s1 == ref


def test_messenger_smoke(capsys):
    from orcai_tpu.utils.messenger import Messenger

    m = Messenger(title="Test", verbosity=3)
    m.part("part one")
    m.info("hello", indent=1)
    m.debug({"a": 1})
    m.warning("careful")
    m.error("bad")
    m.success("done")
    out = capsys.readouterr().out
    assert "Test" in out and "hello" in out and "done" in out

    silent = Messenger(verbosity=0)
    silent.info("should not appear")
    assert "should not appear" not in capsys.readouterr().out
