// Native BPE encoder — the hot merge loop of the SentencePiece-compatible
// tokenizer (lcasr_tpu/data/tokenizer.py), as a CPython extension.
//
// The reference leaned on the sentencepiece C++ library for tokenization
// (reference lcasr/utils/audio_tools.py:7,191-194); this is the equivalent
// native component for this framework: greedy best-score merging over a
// doubly-linked symbol list with a lazy max-heap agenda, exactly matching
// the pure-Python fallback (tests enforce identical output).
//
// Build: see build.py next to this file (g++ -O2 -shared -fPIC).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int> piece_to_id;
  std::vector<float> scores;
};

struct Candidate {
  float neg_score;  // min-heap by (-score, left_pos) == max score, leftmost
  int left;
  int right;
  std::string merged;
  bool operator>(const Candidate& o) const {
    if (neg_score != o.neg_score) return neg_score > o.neg_score;
    if (left != o.left) return left > o.left;
    return right > o.right;  // full tie-break, matches the Python heap
  }
};

// UTF-8 aware split into code points
std::vector<std::string> utf8_chars(const char* s, Py_ssize_t n) {
  std::vector<std::string> out;
  Py_ssize_t i = 0;
  while (i < n) {
    unsigned char c = static_cast<unsigned char>(s[i]);
    int len = 1;
    if ((c & 0x80) == 0x00) len = 1;
    else if ((c & 0xE0) == 0xC0) len = 2;
    else if ((c & 0xF0) == 0xE0) len = 3;
    else if ((c & 0xF8) == 0xF0) len = 4;
    if (i + len > n) len = 1;  // tolerate malformed tails
    out.emplace_back(s + i, len);
    i += len;
  }
  return out;
}

void tokenizer_capsule_destructor(PyObject* capsule) {
  delete static_cast<Tokenizer*>(
      PyCapsule_GetPointer(capsule, "lcasr_bpe.Tokenizer"));
}

// init(pieces: list[bytes|str], scores: list[float]) -> capsule
PyObject* bpe_init(PyObject*, PyObject* args) {
  PyObject* pieces;
  PyObject* scores;
  if (!PyArg_ParseTuple(args, "OO", &pieces, &scores)) return nullptr;
  auto* tok = new Tokenizer();
  Py_ssize_t n = PyList_Size(pieces);
  tok->scores.resize(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* p = PyList_GetItem(pieces, i);
    Py_ssize_t len = 0;
    const char* data = PyUnicode_AsUTF8AndSize(p, &len);
    if (data == nullptr) {
      delete tok;
      return nullptr;
    }
    tok->piece_to_id.emplace(std::string(data, len), static_cast<int>(i));
    tok->scores[i] =
        static_cast<float>(PyFloat_AsDouble(PyList_GetItem(scores, i)));
  }
  return PyCapsule_New(tok, "lcasr_bpe.Tokenizer",
                       tokenizer_capsule_destructor);
}

// encode(capsule, text: str, unk_id: int) -> list[int]
// `text` must already be normalized with spaces replaced by U+2581.
PyObject* bpe_encode(PyObject*, PyObject* args) {
  PyObject* capsule;
  const char* text;
  Py_ssize_t text_len;
  int unk_id;
  if (!PyArg_ParseTuple(args, "Os#i", &capsule, &text, &text_len, &unk_id))
    return nullptr;
  auto* tok = static_cast<Tokenizer*>(
      PyCapsule_GetPointer(capsule, "lcasr_bpe.Tokenizer"));
  if (tok == nullptr) return nullptr;

  std::vector<std::string> sym = utf8_chars(text, text_len);
  const int n = static_cast<int>(sym.size());
  if (n == 0) return PyList_New(0);

  std::vector<int> nxt(n), prv(n);
  std::vector<bool> alive(n, true);
  for (int i = 0; i < n; ++i) {
    nxt[i] = (i + 1 < n) ? i + 1 : -1;
    prv[i] = i - 1;
  }

  std::priority_queue<Candidate, std::vector<Candidate>, std::greater<>> heap;
  auto push = [&](int i) {
    if (i < 0) return;
    int j = nxt[i];
    if (j < 0) return;
    std::string merged = sym[i] + sym[j];
    auto it = tok->piece_to_id.find(merged);
    if (it != tok->piece_to_id.end()) {
      heap.push({-tok->scores[it->second], i, j, std::move(merged)});
    }
  };
  for (int i = 0; i + 1 < n; ++i) push(i);

  while (!heap.empty()) {
    Candidate c = heap.top();
    heap.pop();
    int i = c.left, j = c.right;
    if (!alive[i] || !alive[j] || nxt[i] != j) continue;
    if (sym[i] + sym[j] != c.merged) continue;  // stale agenda entry
    sym[i] = std::move(c.merged);
    alive[j] = false;
    nxt[i] = nxt[j];
    if (nxt[j] >= 0) prv[nxt[j]] = i;
    if (prv[i] >= 0 && alive[prv[i]]) push(prv[i]);
    push(i);
  }

  PyObject* out = PyList_New(0);
  for (int i = 0; i != -1; i = nxt[i]) {
    if (!alive[i]) continue;
    auto it = tok->piece_to_id.find(sym[i]);
    if (it != tok->piece_to_id.end()) {
      PyObject* v = PyLong_FromLong(it->second);
      PyList_Append(out, v);
      Py_DECREF(v);
    } else {
      // unknown merged symbol: emit per-codepoint ids / unk
      for (const auto& ch : utf8_chars(sym[i].data(), sym[i].size())) {
        auto ct = tok->piece_to_id.find(ch);
        PyObject* v = PyLong_FromLong(
            ct != tok->piece_to_id.end() ? ct->second : unk_id);
        PyList_Append(out, v);
        Py_DECREF(v);
      }
    }
  }
  return out;
}

PyMethodDef methods[] = {
    {"init", bpe_init, METH_VARARGS, "Build a native BPE tokenizer."},
    {"encode", bpe_encode, METH_VARARGS, "Encode normalized text to ids."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "bpe_native", nullptr, -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_bpe_native(void) { return PyModule_Create(&moduledef); }
