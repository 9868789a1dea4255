"""`python -m sparkfm_tpu` entry point."""

import sys

from sparkfm_tpu.cli import main

sys.exit(main())
