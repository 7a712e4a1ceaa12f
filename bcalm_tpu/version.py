"""Version info for bcalm-tpu.

Mirrors the reference's VERSION/git-SHA banner machinery
(/root/reference/CMakeLists.txt:21-40, /root/reference/src/main.cpp:30-37).
"""

__version__ = "0.1.0"
COMPATIBLE_REFERENCE = "BCALM v2.2.3"


def version_string() -> str:
    return f"bcalm-tpu {__version__} (capability target: {COMPATIBLE_REFERENCE})"
