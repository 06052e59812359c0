"""``python -m apache_spark_link_prediction_spark`` — see cli.py."""

import sys

from .cli import main

sys.exit(main())
