"""``python -m hedonic_ray`` → the argparse CLI (cli.py)."""

import sys

from hedonic_ray.cli import main

sys.exit(main())
