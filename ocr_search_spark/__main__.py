"""``python -m ocr_search_spark <job> …`` / spark-submit entry.

Two invocation modes, same file (north_rule: "run via spark-submit
--py-files"):

* ``python -m ocr_search_spark`` — executed as the package's __main__,
  the relative import works.
* ``spark-submit --py-files "$ZIP" path/to/__main__.py`` —
  spark-submit runs the FILE as a top-level script (no parent
  package), so the relative form raises ImportError; the absolute
  import then resolves ``ocr_search_spark`` from the shipped zip that
  --py-files put on sys.path.
"""

import sys

try:
    from .jobs import main
except ImportError:  # spark-submit script mode: no package context
    from ocr_search_spark.jobs import main

sys.exit(main())
