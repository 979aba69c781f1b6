"""Label pipeline extras: call equivalences, masking, interval semantics."""

import numpy as np

from orcai_tpu.io.jsonio import write_vector_to_json
from orcai_tpu.pipeline.labels import convert_annotation, intervals_to_mask
from orcai_tpu.utils import MASK_VALUE, Messenger


def test_intervals_to_mask_matches_naive():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 100, 5000)
    for _ in range(5):
        starts = rng.uniform(0, 95, size=8)
        stops = starts + rng.uniform(0.1, 5, size=8)
        naive = np.zeros(len(t), bool)
        for s, e in zip(starts, stops):
            naive |= (t >= s) & (t <= e)
        got = intervals_to_mask(t, starts, stops)
        np.testing.assert_array_equal(got, naive)


def _setup_recording(tmp_path, name="rec", n_frames=1000, dt=256 / 48000):
    spec_dir = tmp_path / name / "spectrogram"
    spec_dir.mkdir(parents=True)
    times = np.arange(n_frames) * dt
    write_vector_to_json(times, spec_dir / "times.json")
    return times


def test_convert_annotation_with_equivalences(tmp_path):
    times = _setup_recording(tmp_path)
    ann = tmp_path / "rec.txt"
    ann.write_text("0.5\t1.0\tN9\n2.0\t2.5\tW\n3.0\t3.2\tIGNORED\n")

    equiv = {"N9": "PHS", "W": "WHISTLE"}
    array, label_dict = convert_annotation(
        annotation_file_path=ann,
        recording_data_dir=tmp_path,
        label_calls=["PHS", "WHISTLE", "BUZZ"],
        labels_present=["PHS", "WHISTLE"],
        labels_masked=["BUZZ"],
        call_equivalences=equiv,
        msgr=Messenger(verbosity=0),
    )
    assert list(array.columns) == ["PHS", "WHISTLE", "BUZZ"]
    assert label_dict == {"PHS": "present", "WHISTLE": "present", "BUZZ": "masked"}
    dt = times[1] - times[0]
    phs = array["PHS"].to_numpy()
    active = np.flatnonzero(phs == 1)
    assert abs(active[0] * dt - 0.5) < 2 * dt
    assert abs(active[-1] * dt - 1.0) < 2 * dt
    # masked column is MASK_VALUE everywhere
    assert (array["BUZZ"] == MASK_VALUE).all()
    # IGNORED label (not in equivalences) contributes nothing
    w = array["WHISTLE"].to_numpy()
    t_ignored = int(3.1 / dt)
    assert w[t_ignored] == 0


def test_convert_annotation_without_equivalences(tmp_path):
    _setup_recording(tmp_path, name="rec2")
    ann = tmp_path / "rec2.txt"
    ann.write_text("1.0\t2.0\tBUZZ\n")
    array, label_dict = convert_annotation(
        annotation_file_path=ann,
        recording_data_dir=tmp_path,
        label_calls=["BUZZ"],
        labels_present=["BUZZ"],
        labels_masked=[],
        msgr=Messenger(verbosity=0),
    )
    assert array["BUZZ"].sum() > 0
