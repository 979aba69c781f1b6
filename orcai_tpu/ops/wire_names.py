"""Wire-codec NAMES, dependency-free.

The registry constant lives here — not in ops/wire_codec.py, which imports
jax at module scope — so the CLI can build its `--wire_codec` choice lists
from the single source of truth without paying the jax import on every
`orcai --help` (cli.py lazy-imports everything heavy for exactly that
reason). ops/wire_codec.py re-exports WIRE_CODECS for all numeric callers;
adding a codec there (and to wire_bytes_per_sample etc.) starts HERE, and
every CLI surface picks it up automatically.
"""

WIRE_CODECS = (
    "exact", "mulaw8", "bfp6", "bfp5", "sp-bfp6", "sp-bfp5", "sp11-bfp5"
)
