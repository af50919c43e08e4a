from recommendit_tpu.utils.latency import LatencyTracker  # noqa: F401
from recommendit_tpu.utils.logging import get_logger, setup_logging  # noqa: F401
