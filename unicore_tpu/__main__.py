import sys

from unicore_tpu.cli import main

sys.exit(main())
