"""Deterministic seed registry.

Mirrors the reference's purpose-scoped seed-ID scheme (reference:
auxiliary.py:15-26) so that, given the same 128-bit master seed, every random
draw in the data pipeline is reproducible — and snippet tables match the
reference's bit-for-bit, because the composed seed ``[SEED_ID, master_seed]``
feeds ``np.random.default_rng`` the same way.
"""

from __future__ import annotations

import numpy as np

# Purpose-scoped seed IDs, combined with the project master seed as
# [SEED_ID, master_seed] (reference: auxiliary.py:16-23).
SEED_ID_MAKE_SNIPPET_TABLE = 1
SEED_ID_FILTER_SNIPPET_TABLE = 2
SEED_ID_CREATE_DATALOADER = {"train": 3, "val": 4, "test": 5, "unfiltered_test": 6}
SEED_ID_LOAD_TRAIN_DATA = 7
SEED_ID_LOAD_VAL_DATA = 8
SEED_ID_LOAD_TEST_DATA = 9
SEED_ID_UNFILTERED_TEST_DATA = 10
SEED_ID_LOAD_UNFILTERED_TEST_DATA = 11

# Sentinel marking label entries as "presence not possible" (reference:
# auxiliary.py:26). Loss/metrics exclude these positions.
MASK_VALUE = -1.0


def rng_for(seed_id: int, master_seed: int | None) -> np.random.Generator:
    """A numpy Generator scoped to one pipeline purpose.

    ``master_seed`` is the project's 128-bit SeedSequence entropy
    (orcai_parameter["seed"]). ``None`` gives a fresh unseeded generator.
    """
    if master_seed is None:
        return np.random.default_rng()
    return np.random.default_rng(seed=[seed_id, master_seed])


def shuffle_seed_from(seed: int | list[int] | None) -> int:
    """Derive a 32-bit shuffle seed from a composed seed list.

    Matches the reference's derivation for dataset shuffling
    (io.py:177-179): first state word of a SeedSequence over the seed.
    """
    return int(np.random.SeedSequence(seed).generate_state(1)[0])
