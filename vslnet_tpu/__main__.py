"""`python -m vslnet_tpu` == `python main.py` (vslnet_tpu/cli.py)."""
from vslnet_tpu.cli import main

if __name__ == "__main__":
    main()
