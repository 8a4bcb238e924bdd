"""Scene model: host-side construction API + packing to device arrays.

Mirrors the reference scene API surface (scene.h:134-149, scene.cpp:9-242):
``add_material`` / ``add_diffuse_material`` / ``add_translucent_material`` /
``add_emissive_material``, ``add_plane`` / ``add_sphere`` / ``add_box`` /
``add_mesh`` with optional forward/inverse transform pairs, automatic light
registration for emissive primitives (scene.cpp:92-96), planes kept out of the
BVH in their own array (scene.h:116), and ``create_scene_bvh`` building a
binned-SAH TLAS over world AABBs obtained by transforming all 8 object-AABB
corners (scene.cpp:224-236).

TPU-first packing: ``Scene.pack()`` lowers the whole scene to ``PackedScene``,
a pytree of SoA jnp arrays (materials, primitives, planes, lights, global
leaf-ordered triangle arrays, and ONE threaded skip-link BVH containing the
TLAS with every mesh-instance subtree grafted in — see ops/bvh.py).  The hot
traversal loop then runs in lockstep over ray batches with pure gathers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core import vec
from ..core.sampler import Strategy
from ..core.vec import Affine, Vec3
from ..ops import bvh as bvh_mod
from . import materials as mat_mod
from .camera import Camera, make_camera
from .mesh import Mesh

# primitive type codes (primitives.h:3-10)
PRIM_NONE = 0
PRIM_PLANE = 1
PRIM_SPHERE = 2
PRIM_BOX = 3
PRIM_MESH = 4
PRIM_CSG = 5


@dataclass(frozen=True)
class SceneSettings:
    """scene.h:64-82.  Frozen + hashable so it can be a jit static arg; the
    commit-at-frame-boundary protocol (render_all_tiles raytracer.cpp:700-724)
    lives in runtime/progressive.py."""

    next_event_estimation: bool = True
    importance_sample_lights: bool = True
    importance_sample_diffuse: bool = True
    use_mis: bool = True
    russian_roulette: bool = True
    caustics: bool = True
    sampling_strategy: int = Strategy.STRATIFIED
    vignette_strength: float = 0.25
    lens_distortion: float = 1.0
    f_factor: float = 0.0
    diaphragm_edges: float = 6.0
    phi_shutter_max: float = 0.5
    samples_per_pixel: int = 1
    max_bounce_count: int = 12
    integrator: str = "Advanced Pathtracer"
    # Evidence flag, not a feature: reproduce the reference's EXACT MIS
    # arithmetic (integrators.cpp:660-669 add-pdfs emissive-hit weight with
    # light_pdf = t^2/cos and no area/pick terms; :757-768 pick-rcp
    # multiplied into the summed NEE pdf).  The TPU build uses the proper
    # one-sample balance heuristic by default because the reference's form
    # does not converge to its own ground-truth integrators —
    # tests/test_integrators.py::test_reference_mis_form_is_biased renders
    # both against brute force and demonstrates the bias quantitatively.
    reference_mis: bool = False
    # env-map NEE (the reference's stubbed feature, implemented here) adds
    # a third traversal call per bounce; this toggle exists for memory/
    # program-size-constrained runs (the axon tunnel caps per-process
    # executables) — BRDF sampling still sees the env map when off
    env_nee: bool = True
    # Whitted deterministic first-split (queued refraction continuation
    # lane) vs single-sample stochastic branch selection.  jit-static like
    # everything here; the stochastic variant exists as A/B variance
    # evidence (tests/test_integrators.py).
    whitted_true_split: bool = True


@dataclass(frozen=True)
class PostProcessSettings:
    """scene.h:84-90 + defaults from init_scene (raytracer.cpp:1444-1451)."""

    exposure: float = 0.0
    tonemapping: bool = True
    srgb_transform: bool = True
    midpoint: float = 0.5
    contrast: float = 0.0
    dither: bool = True


class PackedScene(NamedTuple):
    """Device-resident scene. All fields are jnp arrays (pytree leaves);
    zero-size categories are padded to length >=1 and masked by the static
    counts carried in the threaded BVH / caller-side Python ints."""

    # materials, SoA over M entries (index 0 reserved: "air", ior=1, medium)
    mat_flags: jnp.ndarray  # (M,) uint32
    mat_albedo: Vec3
    mat_checker: Vec3
    mat_emission: Vec3
    mat_ior: jnp.ndarray
    mat_metallic: jnp.ndarray
    mat_roughness: jnp.ndarray
    mat_is_medium: jnp.ndarray  # (M,) bool
    mat_absorb: Vec3
    # all per-material fields packed as (M,16) rows so a bounce does TWO
    # row gathers (mat_i, mat_t) instead of ~25 scalar gathers:
    # [albedo3 | emission3 | absorb3 | checker3 | ior, metallic, roughness,
    #  code] with code = flags + 8*is_medium (exact small ints)
    mat16: jnp.ndarray  # (M,16) f32

    # planes (P>=1, padded with an unhittable plane)
    plane_n: Vec3
    plane_d: jnp.ndarray
    plane_mat: jnp.ndarray  # (P,) int32

    # non-plane primitives (K>=1)
    prim_type: jnp.ndarray  # (K,) int32
    prim_mat: jnp.ndarray  # (K,) int32
    prim_fwd: jnp.ndarray  # (K,12) row-major (3,4) forward
    prim_inv: jnp.ndarray  # (K,12) inverse
    prim_r: jnp.ndarray  # (K,) sphere radius
    prim_box_r: Vec3  # box half extents
    # inverse transform (12) + box half extents (3) + type (1) packed as
    # (K,16) rows for the deferred-normal pass (one gather, not 5)
    prim_nrm16: jnp.ndarray  # (K,16) f32

    # lights (L>=1, masked by n_lights)
    light_prim: jnp.ndarray  # (L,) int32 index into primitives
    # all per-light NEE data packed as (L,16) rows [fwd12 | r | emission3]:
    # the integrator reads the picked light through ONE one-hot MXU
    # contraction instead of 7+ per-ray small-table gathers (tools/prof24:
    # the gathers cost ~61 ms/bounce at 2M rays)
    light16: jnp.ndarray  # (L,16) f32

    # global triangle soup, leaf-ordered per mesh (T>=1)
    tri_a: Vec3
    tri_b: Vec3
    tri_c: Vec3
    tri_na: Vec3  # per-vertex normals (zero if none)
    tri_nb: Vec3
    tri_nc: Vec3
    tri_has_n: jnp.ndarray  # (T,) bool

    # unified threaded BVH (N>=1)
    node_lo: Vec3
    node_hi: Vec3
    node_miss: jnp.ndarray  # (N,) int32
    node_kind: jnp.ndarray  # (N,) int32
    node_first: jnp.ndarray  # (N,) int32
    node_count: jnp.ndarray  # (N,) int32
    node_inst: jnp.ndarray  # (N,) int32

    # 8-wide row BVH (ops/wide_bvh.py) — the hot traversal path
    wide_rows: jnp.ndarray  # (R, 64) float32, int lanes as exact float values
    wide_depth_arr: jnp.ndarray  # (D,) dummy; D = static stack bound
    scene_lo: jnp.ndarray  # (3,) world AABB of all non-plane geometry
    scene_hi: jnp.ndarray  # (3,) (ray-sorting Morton quantization bounds)
    # world-space per-triangle shading data, wide-leaf-ordered (Tw>=1)
    wtri_ng: Vec3
    wtri_na: Vec3
    wtri_nb: Vec3
    wtri_nc: Vec3
    wtri_has_n: jnp.ndarray  # (Tw,) bool
    # all four tri normals + has_n packed as (Tw, 16) rows: the deferred-
    # normal pass gathers ONE row per hit instead of 13 scalar arrays
    # (TPU random access is per-index latency-bound, docs/PERFORMANCE.md)
    wtri_nrm16: jnp.ndarray  # (Tw, 16) f32

    # sky / lighting environment
    sky_bot: Vec3  # scalars
    sky_top: Vec3
    ambient_light: Vec3

    # environment map (equirect), masked by has_env
    env_pixels: jnp.ndarray  # (He, We, 3) float32 (1x1 zero if none)
    # env importance-sampling tables (ops/envmap.py); (1,) zeros if none
    env_cdf_marginal: jnp.ndarray  # (He+1,)
    env_cdf_conditional: jnp.ndarray  # (He, We+1)
    # O(1) alias sampler + per-texel pdf numerator (ops/envmap.py
    # build_env_alias): the CDF inverse costs ~25 sequential 2M-wide
    # scalar gathers per draw (tools/prof39); (1,) dummies if no env
    env_alias_prob: jnp.ndarray  # (K,)
    env_alias_idx: jnp.ndarray  # (K,) exact-float int
    env_pdf_num: jnp.ndarray  # (K,)

    # leaf-DMA split tables (pallas_packet._kernel_v4), built at pack time
    # only when wide_rows exceeds the VMEM residence budget: internal+prim
    # rows (with per-child encoded links in lanes 50..57) stay resident,
    # leaf rows stream from HBM.  None for scenes that fit (None pytree
    # leaves vanish, so the common case costs nothing).
    v4_res: Optional[jnp.ndarray] = None  # (Ri, 64) f32
    v4_leaf: Optional[jnp.ndarray] = None  # (L, 128) f32, merged dense rows

    @property
    def n_lights(self) -> int:
        return int(self.light_prim.shape[0])


def _affine_or_identity(t: Optional[Affine]) -> Affine:
    return t if t is not None else vec.identity()


@dataclass
class Scene:
    """Host-side scene under construction."""

    name: str = "unnamed"
    filter_name: str = "Mitchell Netravali"  # init_scene default (raytracer.cpp:1427)
    camera: Camera = field(default_factory=make_camera)
    settings: SceneSettings = field(default_factory=SceneSettings)
    post_settings: PostProcessSettings = field(default_factory=PostProcessSettings)
    top_sky_color: tuple = (0.0, 0.0, 0.0)
    bot_sky_color: tuple = (0.0, 0.0, 0.0)
    ambient_light: tuple = (0.0, 0.0, 0.0)
    env_map: Optional[np.ndarray] = None  # (H, W, 3) float32 equirect

    materials: List[mat_mod.Material] = field(default_factory=list)
    planes: List[tuple] = field(default_factory=list)  # (n, d, mat_id)
    prims: List[dict] = field(default_factory=list)
    lights: List[int] = field(default_factory=list)
    meshes: List[Mesh] = field(default_factory=list)

    def __post_init__(self):
        if not self.materials:
            # slot 0: air — ior 1, participating, no absorption.  The advanced
            # integrator's material stack bottoms out here
            # (integrators.cpp:597-601).
            self.materials.append(
                mat_mod.Material(ior=1.0, is_participating_medium=True)
            )

    # -- materials ----------------------------------------------------------
    def add_material(self, m: mat_mod.Material) -> int:
        self.materials.append(m)
        return len(self.materials) - 1

    def add_diffuse_material(self, albedo, ior, roughness=0.0, checkers=False,
                             checker_color=(0.1, 0.1, 0.1)) -> int:
        return self.add_material(
            mat_mod.diffuse(albedo, ior, roughness, checkers, checker_color))

    def add_translucent_material(self, absorb, ior, roughness=0.0) -> int:
        return self.add_material(mat_mod.translucent(absorb, ior, roughness))

    def add_emissive_material(self, emission_color) -> int:
        return self.add_material(mat_mod.emissive(emission_color))

    # -- primitives ---------------------------------------------------------
    def add_plane(self, mat_id: int, n, d: float) -> int:
        nn = np.asarray(n, np.float64)
        nn = nn / np.linalg.norm(nn)
        self.planes.append((nn.astype(np.float32), float(d), int(mat_id)))
        return -(len(self.planes))  # planes get negative handles

    def _add_prim(self, ptype, mat_id, transform, **data) -> int:
        t = _affine_or_identity(transform)
        self.prims.append(dict(type=ptype, mat=int(mat_id), fwd=t.fwd, inv=t.inv, **data))
        pid = len(self.prims) - 1
        # auto light registration (scene.cpp:92-96)
        if self.materials[mat_id].flags & mat_mod.FLAG_EMISSIVE:
            self.lights.append(pid)
        return pid

    def add_sphere(self, mat_id: int, r: float, transform: Optional[Affine] = None) -> int:
        return self._add_prim(PRIM_SPHERE, mat_id, transform, r=float(r))

    def add_box(self, mat_id: int, r, transform: Optional[Affine] = None) -> int:
        rr = np.asarray(r, np.float32)
        if rr.ndim == 0:
            rr = np.array([rr, rr, rr], np.float32)
        return self._add_prim(PRIM_BOX, mat_id, transform, box_r=rr)

    def add_mesh(self, mat_id: int, mesh: Mesh, transform: Optional[Affine] = None) -> int:
        self.meshes.append(mesh)
        return self._add_prim(PRIM_MESH, mat_id, transform, mesh_id=len(self.meshes) - 1)

    def add_csg_difference(self, mat_id: int, prim_a: int, prim_b: int,
                           transform: Optional[Affine] = None) -> int:
        """API-parity stub for the reference's declared-but-dormant CSG
        (add_test_difference, scene.cpp:161-171): the CSGNode type exists in
        its enum but has NO intersection branch (intersection.cpp:475-490),
        so CSG primitives are registered and then never hit.  Same here: the
        primitive packs with type PRIM_CSG, a zero AABB, and no traversal
        case."""
        return self._add_prim(PRIM_CSG, mat_id, transform,
                              csg_a=int(prim_a), csg_b=int(prim_b))

    # -- packing ------------------------------------------------------------
    def pack(self, bvh_method: str = "sah_binned") -> PackedScene:
        n_mat = len(self.materials)
        mflags = np.zeros(n_mat, np.uint32)
        malb = np.zeros((n_mat, 3), np.float32)
        mchk = np.zeros((n_mat, 3), np.float32)
        memi = np.zeros((n_mat, 3), np.float32)
        mior = np.zeros(n_mat, np.float32)
        mmet = np.zeros(n_mat, np.float32)
        mrgh = np.zeros(n_mat, np.float32)
        mmed = np.zeros(n_mat, bool)
        mabs = np.zeros((n_mat, 3), np.float32)
        for i, m in enumerate(self.materials):
            mflags[i] = m.flags
            malb[i] = m.albedo
            mchk[i] = m.checker_color
            memi[i] = m.emission_color
            mior[i] = m.ior
            mmet[i] = m.metallic
            mrgh[i] = m.roughness
            mmed[i] = m.is_participating_medium
            mabs[i] = m.absorb

        # planes (padded to >=1 with an unhittable plane: n=+Y, d=-inf-ish)
        planes = self.planes or [(np.array([0, 1, 0], np.float32), -3.0e38, 0)]
        pn = np.stack([p[0] for p in planes])
        pd = np.array([p[1] for p in planes], np.float32)
        pm = np.array([p[2] for p in planes], np.int32)

        # primitives (padded to >=1 with a null sphere r=0)
        prims = self.prims or [dict(type=PRIM_NONE, mat=0,
                                    fwd=vec.identity().fwd, inv=vec.identity().inv)]
        k = len(prims)
        ptype = np.array([p["type"] for p in prims], np.int32)
        pmat = np.array([p["mat"] for p in prims], np.int32)
        pfwd = np.stack([p["fwd"].reshape(12) for p in prims]).astype(np.float32)
        pinv = np.stack([p["inv"].reshape(12) for p in prims]).astype(np.float32)
        pr = np.array([p.get("r", 0.0) for p in prims], np.float32)
        pboxr = np.stack([p.get("box_r", np.zeros(3, np.float32)) for p in prims]).astype(np.float32)
        pmesh = np.array([p.get("mesh_id", -1) for p in prims], np.int32)

        # mesh BVHs + global leaf-ordered triangle soup
        tri_offsets = []
        tri_v, tri_n, tri_has = [], [], []
        base = 0
        for mesh in self.meshes:
            mesh.build_bvh(bvh_method)
            tri_offsets.append(base)
            tri_v.append(np.asarray(mesh.triangles, np.float32))
            if mesh.has_normals:
                tri_n.append(np.asarray(mesh.normals, np.float32))
            else:
                tri_n.append(np.zeros_like(tri_v[-1]))
            tri_has.append(np.full(mesh.triangle_count, mesh.has_normals, bool))
            base += mesh.triangle_count
        if base == 0:
            tri_v = [np.zeros((1, 3, 3), np.float32)]
            tri_n = [np.zeros((1, 3, 3), np.float32)]
            tri_has = [np.zeros(1, bool)]
        tv = np.concatenate(tri_v)
        tn = np.concatenate(tri_n)
        th = np.concatenate(tri_has)

        # TLAS over world AABBs of real primitives (scene.cpp:173-242)
        threaded = self._build_threaded(prims, ptype, pfwd, pr, pboxr, pmesh, tri_offsets)
        wide = self._build_wide(prims, ptype, pfwd, pinv, pr, pboxr, pmesh)

        # lights (padded to >=1, masked by n_lights=0 at trace time: we keep
        # the true count in the padded-or-not length; an empty list packs one
        # dummy pointing at prim 0 and integrators get n_lights from the host
        # Scene via static arg)
        lights = self.lights or [0]

        # environment map
        if self.env_map is not None:
            env = np.ascontiguousarray(np.asarray(self.env_map, np.float32))
            from ..ops.envmap import build_env_alias, build_env_cdf
            cdf_m, cdf_c = build_env_cdf(env)
            al_p, al_i, al_pdf = build_env_alias(env)
        else:
            env = np.zeros((1, 1, 3), np.float32)
            cdf_m = np.zeros(2, np.float32)
            cdf_c = np.zeros((1, 2), np.float32)
            al_p = np.ones(1, np.float32)
            al_i = np.zeros(1, np.float32)
            al_pdf = np.ones(1, np.float32)

        def V(a):  # (X,3) -> Vec3 of jnp arrays
            # slice in NUMPY: jnp slicing here is an eager device op whose
            # per-shape compilation dominates pack time for large meshes
            # (~1.4 s per unique shape over the axon backend)
            a = np.asarray(a)
            return Vec3(jnp.asarray(np.ascontiguousarray(a[..., 0])),
                        jnp.asarray(np.ascontiguousarray(a[..., 1])),
                        jnp.asarray(np.ascontiguousarray(a[..., 2])))

        def S(c):  # scalar color tuple -> Vec3 of distinct 0-d arrays.
            # Python-float leaves hit jax's scalar-conversion cache: equal
            # values alias ONE device buffer across many pytree leaves, and
            # executables with donated inputs then see fewer runtime buffers
            # than they were compiled for ("supplied 72 buffers but expected
            # 81").  np.array -> device_put makes each leaf its own buffer.
            return Vec3(jnp.asarray(np.array(c[0], np.float32)),
                        jnp.asarray(np.array(c[1], np.float32)),
                        jnp.asarray(np.array(c[2], np.float32)))

        return PackedScene(
            mat_flags=jnp.asarray(mflags),
            mat_albedo=V(malb), mat_checker=V(mchk), mat_emission=V(memi),
            mat_ior=jnp.asarray(mior), mat_metallic=jnp.asarray(mmet),
            mat_roughness=jnp.asarray(mrgh), mat_is_medium=jnp.asarray(mmed),
            mat_absorb=V(mabs),
            mat16=jnp.asarray(np.concatenate(
                [np.asarray(malb, np.float32),
                 np.asarray(memi, np.float32),
                 np.asarray(mabs, np.float32),
                 np.asarray(mchk, np.float32),
                 np.asarray(mior, np.float32)[:, None],
                 np.asarray(mmet, np.float32)[:, None],
                 np.asarray(mrgh, np.float32)[:, None],
                 (np.asarray(mflags, np.float32)
                  + 8.0 * np.asarray(mmed, np.float32))[:, None]],
                axis=1).astype(np.float32)),
            plane_n=V(pn), plane_d=jnp.asarray(pd), plane_mat=jnp.asarray(pm),
            prim_type=jnp.asarray(ptype), prim_mat=jnp.asarray(pmat),
            prim_fwd=jnp.asarray(pfwd), prim_inv=jnp.asarray(pinv),
            prim_r=jnp.asarray(pr), prim_box_r=V(pboxr),
            prim_nrm16=jnp.asarray(np.concatenate(
                [np.asarray(pinv, np.float32).reshape(len(ptype), 12),
                 np.asarray(pboxr, np.float32).reshape(len(ptype), 3),
                 np.asarray(ptype, np.float32)[:, None]],
                axis=1).astype(np.float32)) if len(ptype) else
            jnp.zeros((0, 16), jnp.float32),
            light_prim=jnp.asarray(np.array(lights, np.int32)),
            light16=jnp.asarray(np.concatenate(
                [pfwd[np.array(lights, np.int32)].reshape(len(lights), 12),
                 pr[np.array(lights, np.int32)][:, None],
                 memi[pmat[np.array(lights, np.int32)]]],
                axis=1).astype(np.float32)),
            tri_a=V(tv[:, 0]), tri_b=V(tv[:, 1]), tri_c=V(tv[:, 2]),
            tri_na=V(tn[:, 0]), tri_nb=V(tn[:, 1]), tri_nc=V(tn[:, 2]),
            tri_has_n=jnp.asarray(th),
            node_lo=V(threaded.lo), node_hi=V(threaded.hi),
            node_miss=jnp.asarray(threaded.miss),
            node_kind=jnp.asarray(threaded.kind.astype(np.int32)),
            node_first=jnp.asarray(threaded.first),
            node_count=jnp.asarray(threaded.count),
            node_inst=jnp.asarray(threaded.inst),
            wide_rows=jnp.asarray(wide.rows),
            wide_depth_arr=jnp.zeros(wide.depth, jnp.int32),
            scene_lo=jnp.asarray(wide.scene_lo), scene_hi=jnp.asarray(wide.scene_hi),
            wtri_ng=V(wide.tri_ng), wtri_na=V(wide.tri_na),
            wtri_nb=V(wide.tri_nb), wtri_nc=V(wide.tri_nc),
            wtri_has_n=jnp.asarray(wide.tri_has_n),
            wtri_nrm16=jnp.asarray(np.concatenate(
                [wide.tri_na, wide.tri_nb, wide.tri_nc, wide.tri_ng,
                 wide.tri_has_n.astype(np.float32)[:, None],
                 np.zeros((len(wide.tri_has_n), 3), np.float32)],
                axis=1).astype(np.float32)),
            sky_bot=S(self.bot_sky_color), sky_top=S(self.top_sky_color),
            ambient_light=S(self.ambient_light),
            env_pixels=jnp.asarray(env),
            env_cdf_marginal=jnp.asarray(cdf_m),
            env_cdf_conditional=jnp.asarray(cdf_c),
            env_alias_prob=jnp.asarray(al_p),
            env_alias_idx=jnp.asarray(al_i),
            env_pdf_num=jnp.asarray(al_pdf),
            **self._v4_split(wide),
        )

    @staticmethod
    def _v4_split(wide):
        """Leaf-DMA split tables for scenes whose unified row table exceeds
        the packet kernel's VMEM residence budget (BUAS_V4=1 forces the
        split for tests; =0 disables).  Host-side numpy only."""
        from ..ops import pallas_packet, wide_bvh
        mode = os.environ.get("BUAS_V4", "")
        rows_bytes = wide.rows.shape[0] * wide.rows.shape[1] * 4
        want = mode == "1" or (
            mode != "0" and rows_bytes > pallas_packet.VMEM_TABLE_LIMIT_BYTES)
        if (not want or wide_bvh.WIDE != 8
                or int(wide.rows[0, 0]) == wide_bvh.KIND_TRIS):
            return {}
        res, leaf = wide_bvh.split_for_dma(wide.rows)
        return {"v4_res": jnp.asarray(res), "v4_leaf": jnp.asarray(leaf)}

    def _build_wide(self, prims, ptype, pfwd, pinv, pr, pboxr, pmesh):
        from ..ops import wide_bvh
        real = [i for i, p in enumerate(prims) if p["type"] != PRIM_NONE]
        item_lo, item_hi = self._world_aabbs(real, prims, ptype, pfwd, pr,
                                             pboxr, pmesh)
        return wide_bvh.build_wide_scene(
            ptype, pfwd.reshape(-1, 3, 4), pr, pinv.reshape(-1, 3, 4), pboxr,
            pmesh, self.meshes, real, item_lo, item_hi)

    def _world_aabbs(self, real, prims, ptype, pfwd, pr, pboxr, pmesh):
        item_lo = np.zeros((max(len(real), 1), 3), np.float32)
        item_hi = np.zeros((max(len(real), 1), 3), np.float32)
        for j, i in enumerate(real):
            t = ptype[i]
            if t == PRIM_SPHERE:
                olo, ohi = np.full(3, -pr[i], np.float32), np.full(3, pr[i], np.float32)
            elif t == PRIM_BOX:
                olo, ohi = -pboxr[i], pboxr[i]
            elif t == PRIM_MESH:
                mesh = self.meshes[pmesh[i]]
                tv = np.asarray(mesh.triangles, np.float32)
                olo, ohi = tv.reshape(-1, 3).min(axis=0), tv.reshape(-1, 3).max(axis=0)
            else:
                olo = ohi = np.zeros(3, np.float32)
            item_lo[j], item_hi[j] = vec.transform_aabb(
                pfwd[i].reshape(3, 4), olo, ohi)
        return item_lo, item_hi

    def _build_threaded(self, prims, ptype, pfwd, pr, pboxr, pmesh, tri_offsets):
        real = [i for i, p in enumerate(prims) if p["type"] != PRIM_NONE]
        if not real:
            em = bvh_mod._Emitter()
            return em.finish()

        item_lo = np.zeros((len(real), 3), np.float32)
        item_hi = np.zeros((len(real), 3), np.float32)
        for j, i in enumerate(real):
            t = ptype[i]
            if t == PRIM_SPHERE:
                olo, ohi = np.full(3, -pr[i], np.float32), np.full(3, pr[i], np.float32)
            elif t == PRIM_BOX:
                olo, ohi = -pboxr[i], pboxr[i]
            elif t == PRIM_MESH:
                mesh = self.meshes[pmesh[i]]
                b = mesh.bvh
                olo, ohi = b.lo[0], b.hi[0]
            else:
                olo = ohi = np.zeros(3, np.float32)
            item_lo[j], item_hi[j] = vec.transform_aabb(
                pfwd[i].reshape(3, 4), olo, ohi)

        tlas = bvh_mod.build_bvh(item_lo, item_hi, method="sah_binned")
        return bvh_mod.flatten_world_bvh(
            tlas,
            np.array(real, np.int32),
            item_lo, item_hi,
            pfwd.reshape(-1, 3, 4),
            pmesh,
            [m.bvh for m in self.meshes],
            tri_offsets,
        )

    @property
    def n_lights(self) -> int:
        return len(self.lights)

    @property
    def has_medium(self) -> bool:
        """True when any SURFACE material (one actually referenced by a
        primitive or plane) is a participating medium.  Pack-time static:
        lets the Whitted integrator skip its queued-continuation lane
        doubling for scenes that can never split (round-2 advisor)."""
        used = {p["mat"] for p in self.prims}
        used.update(m for (_, _, m) in self.planes)
        return any(self.materials[m].is_participating_medium for m in used)
