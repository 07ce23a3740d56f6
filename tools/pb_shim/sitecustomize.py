"""Environment shim: make a pure-python google.protobuf runtime
importable for pyspark's transformWithStateInPandas gencode.

This container has no installable protobuf wheel, but the public
google-cloud-sdk bundled on the machine ships protobuf 6.32.0-dev
(pure python) under its app-engine platform dir. pyspark 4.1's
StateMessage_pb2 gencode declares 6.33.0 and the runtime's version
gate rejects both the older minor and the -dev suffix — for the wire
format and builder APIs the two versions are compatible, so the gate
is no-opped HERE ONLY (processes launched with this directory on
PYTHONPATH, i.e. the TWS execution tests and their Spark python
workers). No repo source imports this; ops gate on google.protobuf
availability as before.

Named sitecustomize.py so Spark's forked python workers activate it
at interpreter start; tests import it explicitly for the driver
process via activate().
"""

import os
import sys

_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _real_runtime() -> bool:
    # `import google.protobuf` alone is NOT a valid probe: Spark puts
    # spark-core.jar on the worker PYTHONPATH, and the jar's bundled
    # google/protobuf/*.proto resources import as an EMPTY namespace
    # package. Only a concrete runtime module proves a real runtime.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def activate() -> bool:
    """Best-effort: returns True when a usable google.protobuf exists."""
    if _real_runtime():
        return True
    if not os.path.isdir(os.path.join(_SDK, "google", "protobuf")):
        return False
    # evict spurious namespace-package portions so the re-import scans
    # the SDK dir (namespace __path__ entries are computed at first
    # import; the cached empty portion would otherwise win)
    for mod in ("google.protobuf", "google"):
        sys.modules.pop(mod, None)
    if _SDK in sys.path:
        sys.path.remove(_SDK)
    sys.path.insert(0, _SDK)
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except ImportError:
        return False
    return _real_runtime()


activate()
