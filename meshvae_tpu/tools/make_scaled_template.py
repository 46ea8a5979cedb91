"""Generate the ~20k-vertex scaled template by midpoint subdivision:
python -m meshvae_tpu.tools.make_scaled_template [src.obj] [dst.obj]

The train driver also calls ensure_template() so `main.py -c
files/scaled20k.cfg` works from a clean checkout: a missing
template20k.obj regenerates from its vendored template5k sibling
(deterministic midpoint subdivision; generated-then-cached exactly like the
hierarchy cache)."""
import os
import sys

from ..mesh.io import load_obj, save_obj
from ..mesh.subdivide import subdivide_to_target

# Generator version marker (leading OBJ comment). v2 = RCM-relabeled
# vertex order (mesh/subdivide.reorder_vertices_rcm) — v1 files (no
# marker, midpoints appended last) shatter block locality and cost the
# grouped-kernel speedup, so they are regenerated in place.
_MARKER = "meshvae_tpu scaled template v2 (rcm)"


def _generated_version(path: str) -> int | None:
    """Generator version of an existing template: 2 for current files,
    None for files we cannot attribute (user-provided, or generated
    before markers existed — indistinguishable, so never clobbered)."""
    try:
        with open(path, "r") as fp:
            first = fp.readline()
    except OSError:
        return None
    if first.startswith("#") and "meshvae_tpu scaled template" in first:
        return 2 if "v2" in first else 1
    return None


def ensure_template(path: str) -> None:
    """Auto-generate a missing scaled template. A path of the form
    .../templateNk.obj with a vendored template5k.obj sibling is produced
    by repeated midpoint subdivision (5k -> 20k -> 80k: x4 vertices per
    round). Multi-host safe: call it unconditionally from every process —
    barrier participation is decided ONLY by deterministic path checks
    (never by os.path.exists on the generated file, which the primary may
    create mid-flight and make a straggler skip the barrier): the primary
    writes if needed, everyone barriers."""
    name = os.path.basename(path)
    if not (name.startswith("template") and name.endswith("k.obj")):
        return
    src = os.path.join(os.path.dirname(path), "template5k.obj")
    if not os.path.exists(src) or os.path.abspath(src) == os.path.abspath(path):
        return
    try:
        target_k = int(name[len("template"):-len("k.obj")])
    except ValueError:
        return
    # midpoint subdivision quadruples the vertex count, so only 5*4^m
    # targets are reachable — anything else would silently train at the
    # wrong resolution (e.g. template10k would get ~20k vertices). A
    # user-provided file is fine; refusal applies only when we would have
    # to generate it (the existence check here is race-free: unreachable
    # targets are never created mid-flight by any process).
    reachable = 5
    while reachable < target_k:
        reachable *= 4
    if reachable != target_k:
        if os.path.exists(path):
            return
        raise ValueError(
            f"cannot generate {name}: midpoint subdivision of template5k "
            f"reaches only 5*4^m vertices (5k, 20k, 80k, ...), not "
            f"{target_k}k — provide the template file explicitly")
    from ..parallel.sharding import is_primary, sync_processes

    if is_primary():
        exists = os.path.exists(path)
        version = _generated_version(path) if exists else None
        if exists and version is None:
            # Could be user-provided OR generated before version markers
            # existed (pre-RCM: midpoints appended, ~8x the operator
            # blocks). We never clobber a file we can't attribute, but the
            # perf cliff deserves a loud hint.
            print(f"note: {path} exists without a generator marker; if it "
                  f"was machine-generated before RCM relabeling, delete it "
                  f"to regenerate with the block-local vertex order",
                  file=sys.stderr)
        if not exists or (version is not None and version < 2):
            # subdivide to ~target_k thousand vertices + RCM relabeling
            # (raw subdivision shatters block locality; see mesh/subdivide)
            mesh = subdivide_to_target(load_obj(src), target_k)
            tmp = path + f".tmp{os.getpid()}"
            save_obj(tmp, mesh.v, mesh.f, comment=_MARKER)
            os.replace(tmp, path)
            print(f"generated {path}: {mesh.num_vertices} vertices "
                  f"(midpoint subdivision of {src})")
    sync_processes(f"scaled_template_{name}")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "./template/template5k.obj"
    dst = sys.argv[2] if len(sys.argv) > 2 else "./template/template20k.obj"
    mesh = subdivide_to_target(load_obj(src), target_k=20)
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    save_obj(dst, mesh.v, mesh.f, comment=_MARKER)
    print(f"wrote {dst}: {mesh.num_vertices} vertices, "
          f"{mesh.num_faces} faces")


if __name__ == "__main__":
    main()
