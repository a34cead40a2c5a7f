"""``python -m raytrace_tpu`` — the RayTracingGPUVulkan executable analogue
(/root/reference/src/main.cpp + CMakeLists.txt:47-51)."""

import sys

from .utils.cli import main

if __name__ == "__main__":
    sys.exit(main())
