"""Classify fatal TPU-backend failures (worker death) vs. ordinary errors.

The remote-dispatch tunnel's worker process can crash or restart mid-queue
(CLAUDE.md environment facts); when it does, EVERY JAX object the process
holds — device arrays, loaded executables, the WindowPredictor's warmed
programs — is poisoned, and every later dispatch through them fails with
the same backend-death error. Long-lived services (pipeline/serve.py) must
distinguish this from a per-input failure (bad wav, short recording): the
former requires rebuilding the device state and is worth one retry; the
latter must be reported once and skipped.

There is no structured error type for this on the remote platform — the
failure surfaces as RuntimeError/XlaRuntimeError text — so classification
is by message family, kept deliberately narrow: a substring match against
the known worker-death phrasings plus the generic gRPC stream-death forms
that the same event produces when it lands mid-RPC.
"""

from __future__ import annotations

# Known phrasings of the backend-death family. The first three are the
# literal worker-death messages observed on this tunnel (CLAUDE.md); the
# rest are the transport errors the same death produces when it severs an
# in-flight RPC. Deliberately NOT included: generic gRPC status texts
# ("UNAVAILABLE: ...", "connection reset by peer") — they also appear in
# the __context__ of transient, already-recovered RPC hiccups, and a
# false positive here costs a pointless predictor rebuild + re-warm
# (minutes of lazy program loads) plus a doomed retry of a bad input.
_CRASH_MARKERS = (
    "worker process crashed",
    "worker process restarted",
    "crashed or restarted",
    "socket closed",
    "failed to connect to remote server",
    "stream removed",
)


def is_backend_crash(exc: BaseException) -> bool:
    """True when `exc` looks like TPU-backend/worker death (unrecoverable
    through existing device handles), rather than an input-specific error.

    Checks the exception and its __cause__/__context__ chain, case-
    insensitively, against the known message family.
    """
    seen: set[int] = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        text = str(e).lower()
        if any(marker in text for marker in _CRASH_MARKERS):
            return True
        e = e.__cause__ or e.__context__
    return False
