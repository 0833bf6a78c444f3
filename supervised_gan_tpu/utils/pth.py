"""Torch ``.pth`` checkpoint interop + native full-state checkpoints.

The reference saves each net as a CPU ``state_dict`` pickle
(``<label>_net_<name>.pth``, models/base_model.py:44-61); the published
pretrained DSGAN stage-1 nets (twostage_D1G1.zip) ship in that format.  We
read and write it losslessly:

  torch layout -> ours:
    conv  weight  (O,I,kh,kw)  -> HWIO: transpose(2,3,1,0)
    convT weight  (I,O,kh,kw)  -> pre-flipped HWIO:
                                  transpose(2,3,0,1) then flip kh,kw
    batchnorm / bias           -> unchanged
  ignored on import: running_mean/var, num_batches_tracked, and the frozen
  multi-scale ``gauss_filter`` (we recompute it as a fixed function).

Layer-kind information comes from walking the Layer tree
(Layer.children()/param_kinds()), so the mapping is generated from the same
constructors that build the networks — no hand-maintained tables.

Torch is used only as a (de)serialization library here; no torch compute.

Native checkpoints (`save_state`/`load_state`) store the *full* train state
(params, optimizer moments, pools, lr, step) — fixing the reference's
lost-Adam-moments-on-resume gap (SURVEY.md §5.3).
"""

import pickle

import numpy as np
import jax


def param_kind_tree(layer):
    kinds = dict(layer.param_kinds())
    for name, child in layer.children().items():
        sub = param_kind_tree(child)
        if sub:
            kinds[name] = sub
    return kinds


def _flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        path = k if not prefix else prefix + "." + k
        if isinstance(v, dict):
            flat.update(_flatten(v, path))
        else:
            flat[path] = v
    return flat


def _lookup(tree, path):
    node = tree
    for part in path.split("."):
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


def _to_torch_array(arr, kind):
    a = np.asarray(arr)
    if kind == "conv":
        return np.transpose(a, (3, 2, 0, 1))            # HWIO -> OIHW
    if kind == "convt":
        return np.transpose(a[::-1, ::-1], (2, 3, 0, 1))  # unflip, HWIO -> IOHW
    return a


def _from_torch_array(a, kind):
    a = np.asarray(a, dtype=np.float32)
    if kind == "conv":
        return np.transpose(a, (2, 3, 1, 0)).copy()
    if kind == "convt":
        return np.transpose(a, (2, 3, 0, 1))[::-1, ::-1].copy()
    return a


def to_torch_state_dict(layer, params):
    """params tree -> flat {torch_key: np.ndarray} in torch layouts."""
    kinds = param_kind_tree(layer)
    out = {}
    for path, arr in sorted(_flatten(params).items()):
        kind = _lookup(kinds, path)
        if kind is None:
            raise KeyError("no param kind for %s" % path)
        out[path] = _to_torch_array(arr, kind)
    return out


def from_torch_state_dict(layer, state_dict, strict=True):
    """flat torch state_dict -> params tree (frozen/running keys skipped).

    strict mirrors torch load_state_dict (reference base_model.py:55-61
    loads are strict): a checkpoint whose architecture does not match the
    constructed net (wrong depth/width) must fail HERE with a named error,
    not surface later as a shape error inside the jitted step.  Found by
    the round-5 full-recipe drive: a sequential-train handoff from a
    mismatched stage-1 net silently loaded and crashed in CRN's stem."""
    kinds = param_kind_tree(layer)
    params = {}
    skipped = []
    for key, val in state_dict.items():
        if key.endswith(("running_mean", "running_var", "num_batches_tracked")) \
                or key.startswith("gauss_filter"):
            continue
        kind = _lookup(kinds, key)
        if kind is None:
            skipped.append(key)
            continue
        node = params
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _from_torch_array(
            val.numpy() if hasattr(val, "numpy") else val, kind)
    if skipped:
        print("pth import: skipped unknown keys: %s" % skipped)
    if strict:
        _validate_against_layer(layer, params, skipped)
    return params


def _validate_against_layer(layer, params, skipped):
    """Raise if the imported tree is missing expected params or any leaf
    shape disagrees with the constructed net (abstract init, no compute)."""
    try:
        expected = jax.eval_shape(layer.init, jax.random.PRNGKey(0))
    except Exception:
        return      # init not traceable — skip validation, keep behavior
    exp = {k: tuple(v.shape) for k, v in _flatten(expected).items()
           if hasattr(v, "shape")}
    got = {k: tuple(np.shape(v)) for k, v in _flatten(params).items()}
    missing = sorted(set(exp) - set(got))
    bad = sorted((k, got[k], exp[k]) for k in got
                 if k in exp and got[k] != exp[k])
    if missing or bad:
        raise ValueError(
            "pth import: checkpoint does not match the constructed net "
            "(wrong architecture flags?): missing=%s shape_mismatches=%s "
            "unknown_keys=%s" % (missing[:8], bad[:8], skipped[:8]))


def save_pth(path, layer, params):
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(layer, params).items()}
    # complete BatchNorm entries so the file is loadable by torch modules
    kinds = _flatten(param_kind_tree(layer))
    for k, kind in kinds.items():
        if kind == "bn":
            base = k.rsplit(".", 1)[0]
            nc = sd[k].shape[0]
            sd.setdefault(base + ".running_mean", torch.zeros(nc))
            sd.setdefault(base + ".running_var", torch.ones(nc))
    torch.save(sd, path)


def load_pth(path, layer):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_torch_state_dict(layer, sd)


# ---------------- native full-train-state checkpoints ---------------- #

def save_state(path, state):
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), state)
    with open(path, "wb") as f:
        pickle.dump(host, f, protocol=4)


def load_state(path):
    with open(path, "rb") as f:
        return pickle.load(f)
