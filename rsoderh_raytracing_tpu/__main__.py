import sys

from rsoderh_raytracing_tpu.cli import main

sys.exit(main())
