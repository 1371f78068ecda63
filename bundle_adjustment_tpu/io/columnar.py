"""Array-native flat-file loading for the large-scale path.

The object-graph readers in `io/readers.py` mirror the reference's
line-by-line readers (survey H3-H13) and build the Python scene graph — the
right tool at metrology scale.  At the framework's target scale (100k..1M
points, BASELINE.json configs 4-5) both the line loop and the object graph
are prohibitive; this module parses the same formats straight into numpy
arrays with the native C++ loader (`bundle_adjustment_tpu.native`) and
assembles an `RCSProblem` without materialising a single Python scene
object.

Format contracts are the reference's flat readers:
  object coords   `name X Y Z [datum]`   ObjectCoordinateFlatFileReader.java:71-96
  image coords    `camId imgId name x y sx sy [rho]`
                                         ImageCoordinateFlatFileReader.java:73-109
  exterior orient `camId imgId X0 Y0 Z0 omega phi kappa`
                                         ExteriorOrientationFlatFileReader.java:69-112
  interior orient `camId x0 y0 c`        InteriorOrientationFlatFileReader.java:66-94
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..native import parse_table


@dataclass
class ObjectPointArrays:
    names: list[str]
    xyz: np.ndarray    # [P, 3] f64
    datum: np.ndarray  # [P] bool


@dataclass
class ImageObservationArrays:
    cam_id: np.ndarray     # [N] int32 (file camera id)
    image_id: np.ndarray   # [N] int32 (file image id)
    point_name_id: np.ndarray  # [N] int32 (index into point_names)
    point_names: list[str]
    xy: np.ndarray         # [N, 2] f64
    sigma: np.ndarray      # [N, 2] f64
    rho: np.ndarray        # [N] f64 (0 where absent)


@dataclass
class ExteriorOrientationArrays:
    cam_id: np.ndarray   # [M] int32
    image_id: np.ndarray  # [M] int32
    eo: np.ndarray        # [M, 6] f64 (X0 Y0 Z0 omega phi kappa)


def load_object_coordinates(path) -> ObjectPointArrays:
    t = parse_table(path, "sfffs")
    ids, names = t.keys[0]
    datum_ids, datum_uniq = t.keys[1]
    # datum flag only when a 5th column equals exactly "1"
    # (ObjectCoordinateFlatFileReader.java:87-90)
    one = datum_uniq.index("1") if "1" in datum_uniq else -2
    keep = (t.ncols >= 4) & ~np.isnan(t.floats).any(axis=1)
    # last occurrence of a name wins (dict overwrite in the reference)
    order = np.flatnonzero(keep)
    last: dict[int, int] = {}
    for r in order:
        last[int(ids[r])] = int(r)
    # first-seen name order, last value wins (dict semantics of the
    # reference's Map<String, ObjectCoordinate>)
    rows_list: list[int] = []
    for r in order:
        row = last.pop(int(ids[r]), None)
        if row is not None:
            rows_list.append(row)
    rows = np.asarray(rows_list, np.int64)
    return ObjectPointArrays(
        names=[names[int(ids[r])] for r in rows],
        xyz=t.floats[rows, :3],
        datum=(datum_ids[rows] == one) & (t.ncols[rows] > 4),
    )


def load_image_coordinates(path) -> ImageObservationArrays:
    t = parse_table(path, "iisfffff")
    name_ids, names = t.keys[0]
    keep = (t.ncols >= 7) & ~np.isnan(t.floats[:, :6]).any(axis=1)
    f = t.floats[keep]
    rho = np.where(np.isnan(f[:, 6]), 0.0, f[:, 6])
    return ImageObservationArrays(
        cam_id=f[:, 0].astype(np.int32),
        image_id=f[:, 1].astype(np.int32),
        point_name_id=name_ids[keep],
        point_names=names,
        xy=np.ascontiguousarray(f[:, 2:4]),
        sigma=np.ascontiguousarray(f[:, 4:6]),
        rho=rho,
    )


def load_exterior_orientations(path) -> ExteriorOrientationArrays:
    t = parse_table(path, "iiffffff")
    keep = (t.ncols >= 8) & ~np.isnan(t.floats).any(axis=1)
    f = t.floats[keep]
    return ExteriorOrientationArrays(
        cam_id=f[:, 0].astype(np.int32),
        image_id=f[:, 1].astype(np.int32),
        eo=np.ascontiguousarray(f[:, 2:8]),
    )


def load_interior_orientation(path) -> np.ndarray:
    """Returns [C, 4]: camId, x0, y0, c (one row per camera id, last wins)."""
    t = parse_table(path, "ifff")
    keep = (t.ncols >= 4) & ~np.isnan(t.floats).any(axis=1)
    f = t.floats[keep]
    out: dict[int, np.ndarray] = {}
    for row in f:
        out[int(row[0])] = row
    return np.stack([out[k] for k in sorted(out)]) if out else np.zeros((0, 4))


def build_rcs_problem(points_path, image_coords_path, eor_path,
                      io_path=None, spec=None, dist=None,
                      fix_datum_points: bool = True, dtype=None):
    """Assemble (RCSProblem, ParamState, spec) directly from flat files.

    Points flagged `datum` become fixed coordinates (the scale path's
    minimal-constraint datum; inner Helmert constraints are the dense
    solver's domain).  Observations referencing unknown point names or
    images without an exterior orientation are dropped, mirroring the
    reference readers' `if name in coordinates` guards
    (ImageCoordinateFlatFileReader.java:99-104).
    """
    import jax.numpy as jnp

    from ..models.distortion import DistortionSpecBuilder
    from ..models.problem import ParamState
    from ..parallel.rcs import RCSProblem, build_image_block_layout

    if dtype is None:
        dtype = jnp.float64 if jnp.zeros(0).dtype == jnp.float64 else jnp.float32

    pts = load_object_coordinates(points_path)
    obs = load_image_coordinates(image_coords_path)
    eor = load_exterior_orientations(eor_path)

    # camera table: unique cam ids in EO order
    cam_ids = sorted(set(int(c) for c in eor.cam_id))
    cam_index = {c: i for i, c in enumerate(cam_ids)}
    C = max(1, len(cam_ids))

    # image table: (cam_id, image_id) pairs in file order
    img_key = [(int(c), int(i)) for c, i in zip(eor.cam_id, eor.image_id)]
    img_index = {k: i for i, k in enumerate(img_key)}
    M = len(img_key)
    eo = eor.eo.copy()
    cam_of_image = np.array([cam_index[k[0]] for k in img_key], np.int32)

    # point table: keep reference file order; map observation name ids
    name_to_pt = {n: i for i, n in enumerate(pts.names)}
    obs_name = [obs.point_names[i] for i in obs.point_name_id]
    pt_of_obs = np.array([name_to_pt.get(n, -1) for n in obs_name], np.int64)
    img_of_obs = np.array(
        [img_index.get((int(c), int(i)), -1)
         for c, i in zip(obs.cam_id, obs.image_id)], np.int64)
    keep = (pt_of_obs >= 0) & (img_of_obs >= 0)

    obs_point = pt_of_obs[keep].astype(np.int32)
    obs_image = img_of_obs[keep].astype(np.int32)
    xy = obs.xy[keep]
    sig = obs.sigma[keep]
    rho = obs.rho[keep]

    P = len(pts.names)
    K = 0
    if spec is None:
        spec = DistortionSpecBuilder().build()
    K = spec.num_coefficients

    io_arr = np.zeros((C, 3))
    if io_path is not None:
        io_rows = load_interior_orientation(io_path)
        for row in io_rows:
            ci = cam_index.get(int(row[0]))
            if ci is not None:
                io_arr[ci] = row[1:4]
    dist_arr = np.zeros((C, K)) if dist is None else np.asarray(dist, float)

    # sigma0^2 = min observation variance clamped to <= 1
    # (BundleAdjustment.java:637-643)
    var = sig**2
    sigma2 = min(1.0, float(var.min())) if var.size else 1.0

    from ..ops.residuals import image_weight_2x2
    import jax

    w2 = jax.vmap(image_weight_2x2)(
        jnp.asarray(var[:, 0], dtype), jnp.asarray(var[:, 1], dtype),
        jnp.asarray(rho, dtype), jnp.full(var.shape[0], sigma2, dtype))

    free_point = np.ones((P, 3))
    if fix_datum_points:
        free_point[pts.datum] = 0.0
    free_eo = np.ones((M, 6))
    free_global = np.ones(C * (3 + K))

    img_perm, img_bstarts = build_image_block_layout(obs_image, M)

    problem = RCSProblem(
        img_perm=jnp.asarray(img_perm),
        img_block_starts=jnp.asarray(img_bstarts),
        obs_point=jnp.asarray(obs_point),
        obs_image=jnp.asarray(obs_image),
        cam_of_image=jnp.asarray(cam_of_image),
        obs_xy=jnp.asarray(xy, dtype),
        obs_weight=w2,
        r0=jnp.asarray(np.zeros(C), dtype),
        num_points=P, num_images=M,
        free_point=jnp.asarray(free_point, dtype),
        free_eo=jnp.asarray(free_eo, dtype),
        free_global=jnp.asarray(free_global, dtype),
    )
    state = ParamState(
        points=jnp.asarray(pts.xyz, dtype),
        io=jnp.asarray(io_arr, dtype),
        dist=jnp.asarray(dist_arr, dtype),
        eo=jnp.asarray(eo, dtype),
    )
    return problem, state, spec
