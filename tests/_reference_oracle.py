"""Import the reference torch implementation as a live numerics oracle.

The reference at /root/reference imports boto3/botocore/requests at module
scope (volta/utils.py:16-22) purely for its S3 download path, which is never
exercised here; we stub those three modules and import the real model code.
Everything else (torch, the encoders, embeddings, losses) runs for real, so
tests can assert forward/loss parity between the reference and volta_tpu on
identical weights.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = os.environ.get("VOLTA_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "volta"))


def load_reference():
    """Return the reference ``volta`` package (cached after first import)."""
    if "volta" in sys.modules:
        return sys.modules["volta"]

    def _stub(name: str, package: bool = False) -> types.ModuleType:
        # give stubs a real ModuleSpec: importlib.util.find_spec raises
        # ValueError on modules with __spec__ None, which breaks later
        # `accelerate`/`transformers` imports probing for boto3
        import importlib.machinery
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        if package:
            mod.__path__ = []
            mod.__spec__.submodule_search_locations = []
        return mod

    if "boto3" not in sys.modules:
        sys.modules["boto3"] = _stub("boto3")
    if "requests" not in sys.modules:
        sys.modules["requests"] = _stub("requests")
    if "botocore" not in sys.modules:
        botocore = _stub("botocore", package=True)
        exceptions = _stub("botocore.exceptions")

        class ClientError(Exception):
            pass

        exceptions.ClientError = ClientError
        botocore.exceptions = exceptions
        sys.modules["botocore"] = botocore
        sys.modules["botocore.exceptions"] = exceptions

    # import the reference package, then take its root OFF sys.path again:
    # the reference repo root also holds train_task.py / train_concap.py /
    # eval_task.py / eval_retrieval.py, which would shadow OUR root-level
    # CLI modules for every later `import train_concap` in the test
    # process. Submodules of the already-imported `volta` package resolve
    # through volta.__path__, not sys.path, so nothing else needs it.
    added = REFERENCE_ROOT not in sys.path
    if added:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import torch
        import volta  # noqa: F401  (the reference package)
        import volta.config  # noqa: F401
        import volta.encoders  # noqa: F401
        import volta.losses  # noqa: F401
    finally:
        if added:
            sys.path.remove(REFERENCE_ROOT)

    if not torch.cuda.is_available():
        # the reference hardcodes torch.zeros(1).cuda() on its zero-loss
        # paths (volta/encoders.py:1097-1107); make .cuda a no-op on CPU
        torch.Tensor.cuda = lambda self, *a, **k: self

    return sys.modules["volta"]


def randomize_state_dict(model, seed: int, ln_jitter: float = 0.05):
    """Fill every parameter with seeded random values so each one is
    load-bearing in a parity comparison (torch's default init leaves LN at
    exactly ones/zeros, which would mask scale/bias import bugs)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        if v.dtype not in (torch.float32, torch.float64):
            new[k] = v
            continue
        if k.endswith(".weight") and v.ndim == 1:
            # 1-D .weight == a LayerNorm scale (Linear/Embedding are 2-D);
            # jitter around 1 so import bugs show while activations stay sane
            new[k] = 1.0 + ln_jitter * torch.randn(v.shape, generator=g)
        else:
            new[k] = 0.05 * torch.randn(v.shape, generator=g)
    model.load_state_dict(new)
    model.eval()
    return {k: v.detach().numpy().copy() for k, v in
            model.state_dict().items()}
