"""``python -m ocr_search_spark <job> …`` / spark-submit module entry."""

import sys

from .jobs import main

sys.exit(main())
