from truthound_spark.cli import main

import sys

sys.exit(main())
