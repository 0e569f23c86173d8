"""Bundle CLI: python -m monai_tpu.bundle <verb> ... (reference: monai/bundle/__main__.py:14-31).

Uses a small argv->kwargs dispatcher instead of python-fire (not in this image).
"""
from __future__ import annotations

import sys

from monai_tpu.bundle.scripts import (
    ckpt_export,
    download,
    init_bundle,
    load,
    run,
    run_workflow,
    verify_metadata,
    verify_net_in_out,
)

VERBS = {
    "run": run,
    "run_workflow": run_workflow,
    "download": download,
    "load": load,
    "ckpt_export": ckpt_export,
    "verify_metadata": verify_metadata,
    "verify_net_in_out": verify_net_in_out,
    "init_bundle": init_bundle,
}


def _parse(value: str):
    import json

    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            pass
    if value.lower() in ("true", "false"):
        return value.lower() == "true"
    try:
        return json.loads(value)
    except Exception:
        return value


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in VERBS:
        print(f"usage: python -m monai_tpu.bundle <verb> [--key value ...]\nverbs: {sorted(VERBS)}")
        return
    verb = VERBS[argv[0]]
    args = []
    kwargs = {}
    it = iter(argv[1:])
    for tok in it:
        if tok.startswith("--"):
            key = tok[2:]
            try:
                val = next(it)
            except StopIteration:
                val = "true"
            kwargs[key] = _parse(val)
        else:
            args.append(_parse(tok))
    verb(*args, **kwargs)


if __name__ == "__main__":
    main()
