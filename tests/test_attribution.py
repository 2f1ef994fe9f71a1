"""Markov removal-effect attribution (functions/attribution.py): the
journey kernel against hand-built journeys, absorbing-chain math against
closed forms, and distributed == local across block layouts."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anansi_ray.functions.attribution import (
    absorption_cvr,
    journey_transitions,
    markov_attribution_distributed,
    markov_attribution_local,
)

CH = ["a", "b"]
START, CONV, DROP = 2, 3, 4


def _events(rows):
    # rows: (user, seq, type)
    return pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], "datetime64[us]"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )


class TestJourneyKernel:
    def test_hand_built(self):
        # user 1: a -> b -> purchase; user 2: a (drop);
        # user 3: purchase first (START->CONV)
        u = np.array([1, 1, 1, 2, 3], np.int64)
        t = np.array(["a", "b", "purchase", "a", "purchase"], dtype=str)
        M = journey_transitions(u, t, CH)
        assert M[START, 0] == 2          # START->a twice
        assert M[0, 1] == 1              # a->b
        assert M[1, CONV] == 1           # b->CONV
        assert M[0, DROP] == 1           # user 2's a->DROP
        assert M[START, CONV] == 1       # user 3
        assert M.sum() == 6

    def test_events_after_first_purchase_ignored(self):
        u = np.array([1, 1, 1, 1], np.int64)
        t = np.array(["a", "purchase", "b", "purchase"], dtype=str)
        M = journey_transitions(u, t, CH)
        assert M[START, 0] == 1 and M[0, CONV] == 1
        assert M[1].sum() == 0 and M[:, 1].sum() == 0  # b never seen

    def test_absorption_closed_form(self):
        # START->a always; a->CONV with p=0.5, a->DROP with p=0.5
        M = np.zeros((5, 5), np.int64)
        M[START, 0] = 2
        M[0, CONV] = 1
        M[0, DROP] = 1
        assert abs(absorption_cvr(M) - 0.5) < 1e-12
        # removing channel a kills all conversion
        assert absorption_cvr(M, removed=0) == 0.0


@pytest.mark.usefixtures("ray_session")
class TestDistributed:
    def test_matches_local_across_layouts(self):
        rng = np.random.default_rng(17)
        rows = []
        seq = 0
        for user in range(80):
            n = rng.integers(1, 8)
            for _ in range(n):
                rows.append(
                    (user, seq, str(rng.choice(["a", "b", "purchase"])))
                )
                seq += 1
        t = _events(rows)
        exp = markov_attribution_local(t, CH).to_pandas()
        for nb in (1, 4, 9):
            got = markov_attribution_distributed(
                rd.from_arrow(t).repartition(nb), CH
            ).to_pandas()
            assert got.equals(exp), f"mismatch at nblocks={nb}"

    def test_attribution_sums_to_one(self):
        rows = [(1, 0, "a"), (1, 1, "purchase"), (2, 2, "b"), (2, 3, "purchase"),
                (3, 4, "a"), (4, 5, "b")]
        out = markov_attribution_local(_events(rows), CH).to_pandas()
        assert abs(out["attribution"].sum() - 1.0) < 1e-5

    def test_empty(self):
        t = _events([])
        assert markov_attribution_local(t, CH).num_rows == 0
        assert markov_attribution_distributed(rd.from_arrow(t), CH).num_rows == 0
