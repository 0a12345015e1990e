"""3D scene + humans visualization (C17 in the survey inventory).

Capability parity with reference `mhmocap/visualization.py`
(SceneHumansVisualizer / SkeletonVisualizer, visualization.py:63-844):
reconstructs the static scene point cloud from the aggregated RGB-D
and the per-frame SMPL meshes / skeletons from the optimization
outputs.

The reference requires Open3D's interactive window. Open3D is not a
TPU-image dependency, so this module:
  * uses Open3D when importable (same interactive keybindings: N =
    next frame, U = camera view);
  * otherwise exports standard mesh/point-cloud artifacts (PLY per
    frame + a camera-view matplotlib render) that any external viewer
    opens — the headless-friendly TPU-pod workflow.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..ops.cameras import unproject_points

try:
    import open3d as o3d
    HAVE_OPEN3D = True
except Exception:  # pragma: no cover - environment dependent
    o3d = None
    HAVE_OPEN3D = False

# MuPoTs 17-joint skeleton links (reference make_pose_mesh_mupots,
# visualization.py:603-652)
MUPOTS_LINKS = [
    (0, 16), (16, 1), (1, 15), (15, 14),
    (1, 2), (2, 3), (3, 4),
    (1, 5), (5, 6), (6, 7),
    (14, 8), (8, 9), (9, 10),
    (14, 11), (11, 12), (12, 13),
]


def scene_pointcloud_arrays(scene_img, scene_depth, scene_mask, cam_K,
                            stride: int = 1):
    """Colored scene point cloud from the aggregated RGB-D
    (visualization.py:478-600 capability)."""
    import jax.numpy as jnp

    H, W = scene_depth.shape
    ys, xs = np.mgrid[0:H:stride, 0:W:stride]
    uvd = np.stack([xs + 0.5, ys + 0.5,
                    scene_depth[ys, xs]], axis=-1).reshape(-1, 3)
    pts = np.asarray(unproject_points(jnp.asarray(uvd, jnp.float32),
                                      jnp.asarray(cam_K)))
    ok = scene_mask[ys, xs].reshape(-1) > 0.5
    colors = scene_img[ys, xs].reshape(-1, 3).astype(np.float32) / 255.0
    return pts[ok], colors[ok]


def write_ply_points(path, pts, colors=None):
    """Minimal ASCII PLY point-cloud writer (no external deps)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(pts)}\n"
                "property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i, p in enumerate(pts):
            line = f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}"
            if colors is not None:
                c = (np.clip(colors[i], 0, 1) * 255).astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")


def write_ply_mesh(path, verts, faces):
    """Minimal ASCII PLY triangle-mesh writer."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {len(faces)}\n"
                "property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


class SceneHumansVisualizer:
    """Scene point cloud + per-frame human meshes.

    With Open3D: interactive window, 'N' steps frames, 'U' sets the
    camera-true view (reference visualization.py:284-285). Headless:
    `export(path)` writes scene.ply + human meshes per frame and
    camera-view renders.
    """

    def __init__(self, verts_per_frame, faces, scene_img, scene_depth,
                 scene_mask, cam: Dict, valid=None, stride: int = 1):
        self.verts = np.asarray(verts_per_frame)   # (T, N, V, 3)
        self.faces = np.asarray(faces)
        self.cam = cam
        self.valid = valid
        self.scene_pts, self.scene_colors = scene_pointcloud_arrays(
            scene_img, scene_depth, scene_mask, cam["K"], stride)
        self.frame = 0

    # -- headless path -------------------------------------------------
    def export(self, out_dir: str, max_frames: Optional[int] = 10):
        os.makedirs(out_dir, exist_ok=True)
        write_ply_points(os.path.join(out_dir, "scene.ply"),
                         self.scene_pts, self.scene_colors)
        T = len(self.verts) if max_frames is None else min(
            len(self.verts), max_frames)
        for t in range(T):
            for n in range(self.verts.shape[1]):
                write_ply_mesh(
                    os.path.join(out_dir, f"human_{t:04d}_{n}.ply"),
                    self.verts[t, n], self.faces)
        self.render_camera_view(
            os.path.join(out_dir, "camera_view_0000.png"), frame=0)
        return out_dir

    def render_camera_view(self, path: str, frame: int = 0):
        """Camera-true splat render via matplotlib (headless)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import jax.numpy as jnp
        from ..ops.cameras import project_points

        fig, ax = plt.subplots(figsize=(8, 8))
        uv = np.asarray(project_points(
            jnp.asarray(self.scene_pts), jnp.asarray(self.cam["K"])))
        ax.scatter(uv[:, 0], uv[:, 1], c=self.scene_colors, s=1)
        for n in range(self.verts.shape[1]):
            vuv = np.asarray(project_points(
                jnp.asarray(self.verts[frame, n]),
                jnp.asarray(self.cam["K"])))
            ax.scatter(vuv[:, 0], vuv[:, 1], s=1, alpha=0.5)
        W, H = self.cam["image_size"]
        ax.set_xlim(0, W)
        ax.set_ylim(H, 0)
        ax.set_aspect("equal")
        fig.savefig(path, dpi=120)
        plt.close(fig)

    # -- interactive path ----------------------------------------------
    def run(self):  # pragma: no cover - needs a display + open3d
        if not HAVE_OPEN3D:
            raise RuntimeError(
                "Open3D is not installed; use export() for headless "
                "artifacts")
        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(self.scene_pts)
        pcd.colors = o3d.utility.Vector3dVector(self.scene_colors)
        meshes = []
        for n in range(self.verts.shape[1]):
            m = o3d.geometry.TriangleMesh()
            m.vertices = o3d.utility.Vector3dVector(self.verts[0, n])
            m.triangles = o3d.utility.Vector3iVector(self.faces)
            m.compute_vertex_normals()
            meshes.append(m)

        vis = o3d.visualization.VisualizerWithKeyCallback()
        vis.create_window()
        vis.add_geometry(pcd)
        for m in meshes:
            vis.add_geometry(m)

        def next_frame(v):
            self.frame = (self.frame + 1) % len(self.verts)
            for n, m in enumerate(meshes):
                m.vertices = o3d.utility.Vector3dVector(
                    self.verts[self.frame, n])
                m.compute_vertex_normals()
                v.update_geometry(m)
            return True

        def camera_view(v):
            ctr = v.get_view_control()
            cam_params = ctr.convert_to_pinhole_camera_parameters()
            cam_params.extrinsic = np.eye(4)
            ctr.convert_from_pinhole_camera_parameters(cam_params)
            return True

        vis.register_key_callback(ord("N"), next_frame)
        vis.register_key_callback(ord("U"), camera_view)
        vis.run()
        vis.destroy_window()


class SkeletonVisualizer:
    """Per-frame 17-joint skeletons (reference visualization.py:655-844
    capability): line sets + joint spheres; headless exports PLY line
    segments as thin point chains plus a camera-view render."""

    def __init__(self, joints_per_frame, cam: Dict):
        self.joints = np.asarray(joints_per_frame)  # (T, N, 17, 3)
        self.cam = cam

    def export(self, out_dir: str, max_frames: Optional[int] = 10):
        os.makedirs(out_dir, exist_ok=True)
        T = len(self.joints) if max_frames is None else min(
            len(self.joints), max_frames)
        for t in range(T):
            pts: List[np.ndarray] = []
            for n in range(self.joints.shape[1]):
                for a, b in MUPOTS_LINKS:
                    seg = np.linspace(self.joints[t, n, a],
                                      self.joints[t, n, b], 12)
                    pts.append(seg)
            write_ply_points(
                os.path.join(out_dir, f"skeleton_{t:04d}.ply"),
                np.concatenate(pts, axis=0))
        return out_dir
