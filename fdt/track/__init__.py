from fdt.track.device_tracker import DeviceIoUTracker
from fdt.track.iou_tracker import (IoUTracker, load_tracks, save_tracks,
                                   track_detections, track_video)

__all__ = ["IoUTracker", "DeviceIoUTracker", "track_detections", "track_video",
           "save_tracks", "load_tracks"]
