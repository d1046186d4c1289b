"""Single-frame EndoVis15 evaluation (reference:
scripts/infer_endovis15_segmentation.py) — thin wrapper over
infer_toolpose_segmentation with the endovis15 task defaults.
"""

from __future__ import annotations

from mfcnet_tpu.cli.infer_toolpose_segmentation import main as _main


def main(argv=None):
    argv = list(argv) if argv is not None else None
    defaults = [
        "--prediction_task", "endovis15_segmentation",
        "--num_classes", "11",
    ]
    if argv is None:
        import sys

        argv = defaults + sys.argv[1:]
    else:
        argv = defaults + argv
    return _main(argv)


if __name__ == "__main__":
    main()
