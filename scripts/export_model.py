"""Thin repo-checkout alias for the packaged export tool
(`nextplaid_tpu.scripts_export`, console entry `nextplaid-export-model`)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nextplaid_tpu.scripts_export import main

if __name__ == "__main__":
    main()
