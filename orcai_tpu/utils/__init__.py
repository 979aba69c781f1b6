from orcai_tpu.utils.messenger import Messenger
from orcai_tpu.utils.rle import find_consecutive_ones
from orcai_tpu.utils.seeds import (
    MASK_VALUE,
    SEED_ID_CREATE_DATALOADER,
    SEED_ID_FILTER_SNIPPET_TABLE,
    SEED_ID_LOAD_TEST_DATA,
    SEED_ID_LOAD_TRAIN_DATA,
    SEED_ID_LOAD_UNFILTERED_TEST_DATA,
    SEED_ID_LOAD_VAL_DATA,
    SEED_ID_MAKE_SNIPPET_TABLE,
    SEED_ID_UNFILTERED_TEST_DATA,
    rng_for,
    shuffle_seed_from,
)

__all__ = [
    "Messenger",
    "find_consecutive_ones",
    "MASK_VALUE",
    "SEED_ID_MAKE_SNIPPET_TABLE",
    "SEED_ID_FILTER_SNIPPET_TABLE",
    "SEED_ID_CREATE_DATALOADER",
    "SEED_ID_LOAD_TRAIN_DATA",
    "SEED_ID_LOAD_VAL_DATA",
    "SEED_ID_LOAD_TEST_DATA",
    "SEED_ID_UNFILTERED_TEST_DATA",
    "SEED_ID_LOAD_UNFILTERED_TEST_DATA",
    "rng_for",
    "shuffle_seed_from",
]
