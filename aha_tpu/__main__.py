import sys

from aha_tpu.cli.main import main

sys.exit(main())
