// Native CTC prefix-beam block advance — the no-LM hot loop of
// lcasr_tpu/decoding/beam_search.py:advance, as a CPython extension.
//
// The reference runs its beam searches host-side in Python
// (lcasr/decoding/ctc_beam_search.py); so does this framework's
// reference-parity implementation — but for ONLINE serving the Python
// inner loop (beams x candidates upd() calls) costs ~20 ms per finalized
// 64-frame block at width 25 even at a trained model's 1-5 candidates per
// frame (far more when posteriors are flat), a material slice of the
// ~76 ms serving step.  This extension advances a whole block in C++ with
// the Python semantics (same double-precision logsumexp accumulation in
// the same order, same dict-insertion merge order, same stable ranking),
// so the pure-Python path stays the parity oracle and the serving step
// returns to forward-bound.  LM-fused searches keep the Python path (the
// per-frame batched LM call needs Python anyway).
//
// Parity is enforced by tests/test_beam_native.py: identical beams,
// scores, prefixes, and timestamps vs the Python implementation.
//
// Build: on demand via lcasr_tpu/native/__init__.py (g++ -O2 -shared).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <memory>
#include <unordered_map>
#include <vector>

namespace {

constexpr double LOG0 = -1e30;

// exactly beam_search._logsumexp (math.log/math.exp are the platform libm
// double routines, same as std::log/std::exp here)
inline double lse(double a, double b) {
  if (a <= LOG0 / 2) return b;
  if (b <= LOG0 / 2) return a;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// prefix trie: node id identifies a prefix; id 0 = empty prefix
struct TrieNode {
  int parent;
  int token;
  int depth;
};

// immutable cons list for per-token emission frames (timestamps): copies
// are pointer copies, materialized only for the returned beams
struct FNode {
  std::shared_ptr<const FNode> parent;
  int t;
};
using FPtr = std::shared_ptr<const FNode>;

inline FPtr fcons(const FPtr& parent, int t) {
  auto n = std::make_shared<FNode>();
  n->parent = parent;
  n->t = t;
  return FPtr(n);
}

struct BeamState {
  int node;      // trie id of the prefix
  double p_b;    // log mass ending in blank
  double p_nb;   // log mass ending in the last token
  FPtr frames;   // emission frame per token (len == depth(node))
};

struct NewBeam {
  int node;
  double p_b;
  double p_nb;
  double best_contrib;
  FPtr frames;
};

struct Trie {
  std::vector<TrieNode> nodes;
  std::unordered_map<uint64_t, int> children;

  Trie() { nodes.push_back({-1, -1, 0}); }

  int child(int parent, int token) {
    uint64_t key = (static_cast<uint64_t>(static_cast<uint32_t>(parent)) << 32) |
                   static_cast<uint32_t>(token);
    auto it = children.find(key);
    if (it != children.end()) return it->second;
    int id = static_cast<int>(nodes.size());
    nodes.push_back({parent, token, nodes[parent].depth + 1});
    children.emplace(key, id);
    return id;
  }
};

// advance(beams, log_probs, t0, blank, pad, threshold, beam_width,
//         prune_less_than) -> list of (prefix tuple, p_b, p_nb, frames)
//
//   beams: list of (prefix sequence of ints, p_b float, p_nb float,
//                   frames sequence of ints) in dict-insertion order
//   log_probs: C-contiguous float32 buffer of shape (T, C)
//   pad: -1 = no pad filtering (matches pad_id=None, or pad_id == blank)
//   prune_less_than: NaN = off
PyObject* advance(PyObject*, PyObject* args) {
  PyObject* beams_obj;
  Py_buffer lp_buf;
  long T_l, C_l, t0_l, blank_l, pad_l, width_l;
  double threshold, prune_val;
  if (!PyArg_ParseTuple(args, "Oy*llllldld", &beams_obj, &lp_buf, &T_l, &C_l,
                        &t0_l, &blank_l, &pad_l, &threshold, &width_l,
                        &prune_val))
    return nullptr;
  struct BufGuard {
    Py_buffer* b;
    ~BufGuard() { PyBuffer_Release(b); }
  } guard{&lp_buf};

  const Py_ssize_t T = T_l;
  const Py_ssize_t C = C_l;
  if (lp_buf.len != static_cast<Py_ssize_t>(T * C * sizeof(float))) {
    PyErr_SetString(PyExc_ValueError,
                    "log_probs buffer size != T*C float32 elements");
    return nullptr;
  }
  const float* lp = static_cast<const float*>(lp_buf.buf);
  const int blank = static_cast<int>(blank_l);
  const int pad = static_cast<int>(pad_l);
  const int width = static_cast<int>(width_l);
  const bool has_prune = !std::isnan(prune_val);

  // ---- intern the incoming beams ----
  Trie trie;
  std::vector<BeamState> beams;
  {
    PyObject* seq = PySequence_Fast(beams_obj, "beams must be a sequence");
    if (!seq) return nullptr;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    beams.reserve(n);
    for (Py_ssize_t i = 0; i < n; i++) {
      PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
      PyObject* prefix = PyTuple_GetItem(item, 0);
      PyObject* pb_o = PyTuple_GetItem(item, 1);
      PyObject* pnb_o = PyTuple_GetItem(item, 2);
      PyObject* frames = PyTuple_GetItem(item, 3);
      if (!prefix || !pb_o || !pnb_o || !frames) {
        Py_DECREF(seq);
        return nullptr;
      }
      PyObject* pseq = PySequence_Fast(prefix, "prefix must be a sequence");
      PyObject* fseq = PySequence_Fast(frames, "frames must be a sequence");
      if (!pseq || !fseq) {
        Py_XDECREF(pseq);
        Py_XDECREF(fseq);
        Py_DECREF(seq);
        return nullptr;
      }
      int node = 0;
      FPtr fr;
      Py_ssize_t plen = PySequence_Fast_GET_SIZE(pseq);
      Py_ssize_t flen = PySequence_Fast_GET_SIZE(fseq);
      for (Py_ssize_t k = 0; k < plen; k++) {
        long tok = PyLong_AsLong(PySequence_Fast_GET_ITEM(pseq, k));
        node = trie.child(node, static_cast<int>(tok));
      }
      for (Py_ssize_t k = 0; k < flen; k++) {
        long t = PyLong_AsLong(PySequence_Fast_GET_ITEM(fseq, k));
        fr = fcons(fr, static_cast<int>(t));
      }
      BeamState st;
      st.node = node;
      st.p_b = PyFloat_AsDouble(pb_o);
      st.p_nb = PyFloat_AsDouble(pnb_o);
      st.frames = fr;
      beams.push_back(std::move(st));
      Py_DECREF(pseq);
      Py_DECREF(fseq);
      if (PyErr_Occurred()) {
        Py_DECREF(seq);
        return nullptr;
      }
    }
    Py_DECREF(seq);
  }

  // ---- the frame loop (no Python objects touched from here on) ----
  std::vector<int> keep;
  std::vector<NewBeam> nb;
  std::unordered_map<int, int> slot;  // trie node -> index into nb
  std::vector<int> order;             // stable-sort scratch

  // upd(): merge a contribution into the new-beam set, replicating the
  // Python dict semantics (first insertion fixes the position) and the
  // frames-follow-strongest-contribution rule
  auto upd = [&](int node, const FPtr& frames, double p_blank,
                 double p_non_blank) {
    auto it = slot.find(node);
    int idx;
    if (it == slot.end()) {
      idx = static_cast<int>(nb.size());
      slot.emplace(node, idx);
      NewBeam b;
      b.node = node;
      b.p_b = LOG0;
      b.p_nb = LOG0;
      b.best_contrib = LOG0;
      b.frames = frames;
      nb.push_back(std::move(b));
    } else {
      idx = it->second;
    }
    NewBeam& b = nb[idx];
    b.p_b = lse(b.p_b, p_blank);
    b.p_nb = lse(b.p_nb, p_non_blank);
    double contrib = lse(p_blank, p_non_blank);
    if (contrib > b.best_contrib) {
      b.best_contrib = contrib;
      b.frames = frames;
    }
  };

  {
    Py_BEGIN_ALLOW_THREADS;
    for (Py_ssize_t tl = 0; tl < T; tl++) {
      const float* frame = lp + tl * C;
      const int t = static_cast<int>(t0_l + tl);
      float maxv = frame[0];
      for (Py_ssize_t c = 1; c < C; c++)
        if (frame[c] > maxv) maxv = frame[c];
      // numpy: float32 scalar + python float promotes weakly -> float32
      const float thr = maxv + static_cast<float>(threshold);
      keep.clear();
      for (Py_ssize_t c = 0; c < C; c++)
        if (frame[c] > thr && static_cast<int>(c) != pad)
          keep.push_back(static_cast<int>(c));
      // no candidate survived: carry the beams unchanged (mirrors the
      // Python path's guard) instead of emptying the beam set forever
      if (keep.empty()) continue;

      nb.clear();
      slot.clear();
      for (const BeamState& beam : beams) {
        const int last =
            beam.node == 0 ? -1 : trie.nodes[beam.node].token;
        const double am = lse(beam.p_b, beam.p_nb);
        for (int c : keep) {
          const double p = static_cast<double>(frame[c]);
          if (c == blank) {
            upd(beam.node, beam.frames, am + p, LOG0);
          } else if (c == last) {
            // repeat collapses into the same prefix...
            upd(beam.node, beam.frames, LOG0, beam.p_nb + p);
            // ...or extends after an explicit blank
            upd(trie.child(beam.node, c), fcons(beam.frames, t), LOG0,
                beam.p_b + p);
          } else {
            upd(trie.child(beam.node, c), fcons(beam.frames, t), LOG0,
                am + p);
          }
        }
      }

      // rank: stable sort by score desc == python sorted(key=-score)
      order.resize(nb.size());
      for (size_t i = 0; i < order.size(); i++) order[i] = static_cast<int>(i);
      std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return lse(nb[a].p_b, nb[a].p_nb) > lse(nb[b].p_b, nb[b].p_nb);
      });
      size_t n_keep = std::min(order.size(), static_cast<size_t>(width));
      if (has_prune && n_keep > 0) {
        const NewBeam& top = nb[order[0]];
        double cut = lse(top.p_b, top.p_nb) - prune_val;
        // python filters the whole truncated list; scores are sorted desc,
        // but equal-score boundary cases make a filter (not a cut) exact
        std::vector<int> kept;
        for (size_t k = 0; k < n_keep; k++) {
          const NewBeam& b = nb[order[k]];
          if (lse(b.p_b, b.p_nb) >= cut) kept.push_back(order[k]);
        }
        beams.clear();
        beams.reserve(kept.size());
        for (int idx : kept)
          beams.push_back({nb[idx].node, nb[idx].p_b, nb[idx].p_nb,
                           nb[idx].frames});
        continue;
      }
      beams.clear();
      beams.reserve(n_keep);
      for (size_t k = 0; k < n_keep; k++) {
        const NewBeam& b = nb[order[k]];
        beams.push_back({b.node, b.p_b, b.p_nb, b.frames});
      }
    }
    Py_END_ALLOW_THREADS;
  }

  // ---- materialize the surviving beams ----
  PyObject* out = PyList_New(static_cast<Py_ssize_t>(beams.size()));
  if (!out) return nullptr;
  std::vector<int> toks;
  std::vector<int> frs;
  for (size_t i = 0; i < beams.size(); i++) {
    const BeamState& b = beams[i];
    toks.clear();
    for (int node = b.node; node != 0; node = trie.nodes[node].parent)
      toks.push_back(trie.nodes[node].token);
    std::reverse(toks.begin(), toks.end());
    frs.clear();
    for (const FNode* f = b.frames.get(); f; f = f->parent.get())
      frs.push_back(f->t);
    std::reverse(frs.begin(), frs.end());

    PyObject* ptup = PyTuple_New(static_cast<Py_ssize_t>(toks.size()));
    PyObject* ftup = PyTuple_New(static_cast<Py_ssize_t>(frs.size()));
    if (!ptup || !ftup) {
      Py_XDECREF(ptup);
      Py_XDECREF(ftup);
      Py_DECREF(out);
      return nullptr;
    }
    for (size_t k = 0; k < toks.size(); k++)
      PyTuple_SET_ITEM(ptup, k, PyLong_FromLong(toks[k]));
    for (size_t k = 0; k < frs.size(); k++)
      PyTuple_SET_ITEM(ftup, k, PyLong_FromLong(frs[k]));
    PyObject* item = Py_BuildValue("(NddN)", ptup, b.p_b, b.p_nb, ftup);
    if (!item) {
      Py_DECREF(out);
      return nullptr;
    }
    PyList_SET_ITEM(out, static_cast<Py_ssize_t>(i), item);
  }
  return out;
}

PyMethodDef methods[] = {
    {"advance", advance, METH_VARARGS,
     "No-LM CTC prefix-beam block advance (exact Python-path semantics)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "beam_native", nullptr, -1, methods,
    nullptr,  nullptr,       nullptr,     nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_beam_native(void) { return PyModule_Create(&moduledef); }
