"""MTurk tooling: ratings parsing, worker rejection, Likert folding, sampler."""

import numpy as np
import pandas as pd
import pytest

from efficientdepthestimation_tpu.mturk.process_mturk_results import (
    process_raw_data,
    reject_workers,
)
from efficientdepthestimation_tpu.mturk.process_mturk_second_round_results import (
    convert_to_scores,
)
from efficientdepthestimation_tpu.mturk.tum2kf import FrameSampler


@pytest.fixture
def ratings_csv(tmp_path, rng):
    rows = []
    labels = ["Bad", "Poor", "Fair", "Good", "Excellent"]
    for worker in ("W1", "W2", "W3"):
        for i in range(10):
            rows.append({
                "WorkerId": worker,
                "WorkTimeInSeconds": 2 if worker == "W3" else 30,
                "Answer.rating.label":
                    "Good" if worker == "W3" else labels[int(rng.integers(5))],
                "Input.video_url":
                    f"https://bucket.s3.amazonaws.com/reside_enb0/{i:06d}.mp4",
            })
    path = tmp_path / "ratings.csv"
    pd.DataFrame(rows).to_csv(path, index=False)
    return str(path)


def test_process_raw_data(ratings_csv):
    data = process_raw_data(ratings_csv)
    assert set(data.columns) == {"WorkerId", "WorkTimeInSeconds", "Model",
                                 "Frame", "Rating", "Score"}
    assert (data["Model"] == "hu_enb0").all() or (data["Model"] == "hu_enb0".replace("_", "_")).all() \
        or data["Model"].str.startswith("hu").all()
    assert data["Score"].between(1, 5).all()
    assert data["Frame"].between(0, 9).all()


def test_reject_workers(ratings_csv, tmp_path):
    data = process_raw_data(ratings_csv)
    q = tmp_path / "questionnaire.csv"
    pd.DataFrame({"WorkerId": ["W1"]}).to_csv(q, index=False)
    rejection = reject_workers(data, [str(q)])
    assert bool(rejection.loc["W3", "too_fast"])
    assert bool(rejection.loc["W3", "all_same_answers"])
    assert not bool(rejection.loc["W1", "did_not_complete_questionnaire"])
    assert bool(rejection.loc["W2", "did_not_complete_questionnaire"])
    # everyone has <180 answers in this fixture
    assert rejection["not_enough_answers"].all()


def test_convert_to_scores():
    df = pd.DataFrame({
        "Answer.m-000000-realism.1": [True, False],
        "Answer.m-000000-realism.2": [False, True],
    })
    scores = convert_to_scores(df, ["m-000000-realism"], scale_range=2)
    assert list(scores["m-000000-realism"]) == [0, 1]


def test_frame_sampler():
    frames = list(range(100))
    assert FrameSampler(step=10).choose(frames) == frames[::10]
    assert FrameSampler().frame_range(5, 10).choose(frames) == [5, 6, 7, 8, 9]
    assert FrameSampler(stop_is_inclusive=True).frame_range(5, 10).choose(
        frames) == [5, 6, 7, 8, 9, 10]
    sampler = FrameSampler(fps=30.0).time_range(1.0, 2.0).time_interval(0.5)
    assert sampler.start == 30 and sampler.stop == 60 and sampler.step == 15
