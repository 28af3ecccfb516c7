from fdt.track.iou_tracker import IoUTracker, track_detections, track_video, save_tracks, load_tracks

__all__ = ["IoUTracker", "track_detections", "track_video", "save_tracks", "load_tracks"]
