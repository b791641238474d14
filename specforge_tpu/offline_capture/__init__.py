from specforge_tpu.offline_capture.capture import (
    OfflineCaptureConfig,
    OfflineCaptureRunner,
)

__all__ = ["OfflineCaptureConfig", "OfflineCaptureRunner"]
