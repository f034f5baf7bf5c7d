"""CLI shim: the entry point lives in vslnet_tpu/cli.py so an installed
package exposes it too (`python -m vslnet_tpu`, console script `vslnet`).
Kept at the repo root to mirror the reference's `python main.py ...`."""
from vslnet_tpu.cli import load_or_build_feature_bank, main  # noqa: F401

if __name__ == "__main__":
    main()
