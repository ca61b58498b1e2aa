"""LiDARTracklet — host-side track container for CTRL.

Rebuild of /root/reference/mmdet3d/core/bbox/structures/lidar_tracklet.py:7
(785 LoC): per-frame boxes + timestamps + scores for one track, pose
transforms into a track-centric frame, (de)serialization to WOD Objects bins
(via sst_tpu.core.waymo_bin — object id carried per tracklet), and
conversion to the fixed-shape TrackletBatch arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class LiDARTracklet:
    context_name: str
    obj_id: str
    type_id: int  # WOD Label.Type (1 veh / 2 ped / 4 cyc)
    timestamps: list  # [F] int64 micros
    boxes: np.ndarray  # [F, 7] lidar frame (per-frame ego coords)
    scores: np.ndarray  # [F]

    def __len__(self):
        return len(self.timestamps)

    # ------------------------------------------------------------- transforms

    def to_world(self, poses: dict) -> "LiDARTracklet":
        """Boxes → world frame using per-timestamp 4x4 ego poses."""
        from sst_tpu.ops.incremental import box_frame_transform
        import jax.numpy as jnp

        out = []
        eye = np.eye(4, dtype=np.float64)
        for ts, box in zip(self.timestamps, self.boxes):
            pose = np.asarray(poses[ts], np.float64)
            b = np.asarray(
                box_frame_transform(jnp.asarray(box[None]), jnp.asarray(pose),
                                    jnp.asarray(eye))
            )[0]
            out.append(b)
        return dataclasses.replace(self, boxes=np.stack(out))

    def center_frame(self):
        """Translate all boxes so the track's median center is the origin —
        the track-centric frame the CTRL pipeline trains in."""
        ctr = np.median(self.boxes[:, :3], axis=0)
        boxes = self.boxes.copy()
        boxes[:, :3] -= ctr
        return dataclasses.replace(self, boxes=boxes), ctr

    # ---------------------------------------------------------- (de)serialize

    @staticmethod
    def from_waymo_bin(path: str, min_len: int = 1):
        """Group a tracking-result Objects bin into tracklets by
        (context_name, object id). Requires ids in the bin (tools/ctrl
        generate_track_input.py flow)."""
        from sst_tpu.core.waymo_bin import read_waymo_bin, waymo_box_to_lidar

        objs = read_waymo_bin(path)
        groups: dict = {}
        for o in objs:
            key = (o["context_name"], o.get("id", ""))
            groups.setdefault(key, []).append(o)
        out = []
        for (ctx, oid), items in groups.items():
            items.sort(key=lambda x: x["timestamp_micros"])
            boxes = np.stack([waymo_box_to_lidar(i["box"]) for i in items])
            trk = LiDARTracklet(
                context_name=ctx, obj_id=oid,
                type_id=int(items[0].get("type", 0)),
                timestamps=[i["timestamp_micros"] for i in items],
                boxes=boxes,
                scores=np.asarray([i["score"] for i in items], np.float32),
            )
            if len(trk) >= min_len:
                out.append(trk)
        return out

    def to_frames(self):
        """Back to per-frame dicts for waymo_bin.write_waymo_bin."""
        for ts, box, score in zip(self.timestamps, self.boxes, self.scores):
            yield dict(
                boxes=box[None], scores=np.asarray([score]),
                labels=np.asarray([{1: 0, 2: 1, 4: 2}.get(self.type_id, 0)]),
                context_name=self.context_name, timestamp_micros=ts,
                obj_ids=[self.obj_id],
            )


def tracklets_to_bin(tracklets, path: str,
                     class_names=("Car", "Pedestrian", "Cyclist")):
    """Serialize refined tracklets back to a WOD Objects bin
    (waymo_tracklet_dataset.py:394-451)."""
    from sst_tpu.core.waymo_bin import write_waymo_bin

    frames = [fr for t in tracklets for fr in t.to_frames()]
    return write_waymo_bin(path, frames, class_names)


def pad_tracklet_arrays(points, frame_inds, boxes, scores, gt_boxes, gt_valid,
                        label: int, max_points: int, max_frames: int):
    """One tracklet → fixed-shape arrays for TrackletBatch collation."""
    c = points.shape[1] if len(points) else 6
    p_out = np.zeros((max_points, c), np.float32)
    f_out = np.zeros(max_points, np.int32)
    v_out = np.zeros(max_points, bool)
    n = min(len(points), max_points)
    sel = np.arange(len(points))
    if len(points) > max_points:
        sel = np.random.RandomState(0).choice(len(points), max_points, False)
    p_out[:n] = points[sel][:n]
    f_out[:n] = np.clip(frame_inds[sel][:n], 0, max_frames - 1)
    v_out[:n] = True

    f = min(len(boxes), max_frames)
    b_out = np.zeros((max_frames, 7), np.float32)
    s_out = np.zeros(max_frames, np.float32)
    tv = np.zeros(max_frames, bool)
    g_out = np.zeros((max_frames, 7), np.float32)
    gv = np.zeros(max_frames, bool)
    b_out[:f] = boxes[:f]
    s_out[:f] = scores[:f]
    tv[:f] = True
    if gt_boxes is not None:
        g_out[:f] = gt_boxes[:f]
        gv[:f] = gt_valid[:f]
    return dict(points=p_out, valid=v_out, frame_inds=f_out, trk_boxes=b_out,
                trk_scores=s_out, trk_valid=tv, labels=np.int32(label),
                gt_boxes=g_out, gt_valid=gv)
