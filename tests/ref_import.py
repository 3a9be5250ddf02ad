"""Shared scaffolding for importing the read-only torch reference.

The vendored lib imports boto3/anytree unconditionally and expects a
`transformers` namespace pointing at the reference's folder (the installed
HF transformers would shadow it). Call setup_reference_imports() before
importing anything under `oscar.` or `transformers.pytorch_transformers`.
"""

import os
import sys
import types

REF = "/root/reference"


def setup_reference_imports():
    if not os.path.isdir(REF):
        raise RuntimeError("reference repo not mounted")
    for p in (REF, os.path.join(REF, "transformers")):
        if p not in sys.path:
            sys.path.insert(0, p)
    for name in ("boto3", "botocore", "botocore.exceptions", "anytree"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "botocore.exceptions":
                class ClientError(Exception):
                    pass
                mod.ClientError = ClientError
            sys.modules[name] = mod
    existing = sys.modules.get("transformers")
    if existing is None or not getattr(existing, "__path__", [None])[0] == \
            os.path.join(REF, "transformers"):
        parent = types.ModuleType("transformers")
        parent.__path__ = [os.path.join(REF, "transformers")]
        sys.modules["transformers"] = parent
