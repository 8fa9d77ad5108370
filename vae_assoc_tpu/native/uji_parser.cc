// Native UJI Pen Characters v2 parser — the host-side data-loader hot path.
//
// The TPU framework keeps all math on device; the only host-side work that
// scales with dataset size is parsing the UJI text format into padded point
// arrays (data/uji.py documents the format). This C++ implementation is a
// drop-in for the Python parser (bit-identical outputs, including the
// uniform endpoint-preserving subsample and the y-flip) and is loaded via
// ctypes — no pybind11 dependency. Built on demand by native/__init__.py:
//   g++ -O3 -shared -fPIC uji_parser.cc -o libuji_parser.so
//
// C ABI: uji_parse_file() mallocs one result struct; uji_parse_free()
// releases it. Errors come back in .error instead of exceptions.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

extern "C" {

typedef struct {
  int32_t n_samples;
  int32_t max_points;
  float* points;     // [n_samples, max_points, 2], padded with last point
  int32_t* lengths;  // [n_samples]
  char* names;       // newline-joined per-sample character names
  int64_t names_len;
  char* error;       // non-null on failure (struct otherwise empty)
} UjiParse;

static UjiParse* fail(UjiParse* r, const std::string& msg) {
  r->error = strdup(msg.c_str());
  return r;
}

UjiParse* uji_parse_file(const char* path, int32_t max_points) {
  UjiParse* r = (UjiParse*)calloc(1, sizeof(UjiParse));
  r->max_points = max_points;
  std::ifstream in(path);
  if (!in) return fail(r, std::string("cannot open ") + path);

  struct Sample {
    std::string name;
    std::vector<float> xy;  // concatenated strokes, interleaved x,y
  };
  std::vector<Sample> samples;
  bool have_word = false;
  Sample cur;

  std::string line;
  while (std::getline(in, line)) {
    size_t p = line.find_first_not_of(" \t\r");
    if (p == std::string::npos) continue;
    if (line.compare(p, 2, "//") == 0) continue;
    std::istringstream ls(line);
    std::string tok;
    ls >> tok;
    if (tok == "WORD") {
      if (have_word && !cur.xy.empty()) samples.push_back(cur);
      cur = Sample();
      ls >> cur.name;
      have_word = true;
    } else if (tok == "POINTS") {
      long n = 0;
      ls >> n;
      std::string hash;
      ls >> hash;  // '#'
      if (hash != "#") return fail(r, "malformed POINTS line (missing #)");
      double v;
      long count = 0;
      while (ls >> v) {
        cur.xy.push_back((float)v);
        ++count;
      }
      if (count != 2 * n) {
        std::ostringstream msg;
        msg << "POINTS header says " << n << " points but line has " << count
            << " values";
        return fail(r, msg.str());
      }
    }
    // NUMSTROKES and anything else: ignored, as in the Python parser.
  }
  if (have_word && !cur.xy.empty()) samples.push_back(cur);
  // Zero samples (e.g. comments-only file) is a VALID empty result, exactly
  // as the Python parser returns [] — not an error. The ctypes wrapper
  // short-circuits n_samples == 0 without touching the data pointers.

  int32_t n = (int32_t)samples.size();
  r->n_samples = n;
  r->points = (float*)calloc((size_t)n * max_points * 2, sizeof(float));
  r->lengths = (int32_t*)malloc(n * sizeof(int32_t));

  std::string names;
  for (int32_t i = 0; i < n; ++i) {
    const Sample& s = samples[i];
    long npts = (long)(s.xy.size() / 2);
    std::vector<float> poly;
    poly.reserve((size_t)max_points * 2);
    if (npts > max_points) {
      // numpy.linspace(0, npts-1, max_points).round() — round-half-to-even
      // to match numpy exactly.
      for (int32_t k = 0; k < max_points; ++k) {
        double t = (double)k * (double)(npts - 1) / (double)(max_points - 1);
        long idx = (long)std::nearbyint(t);
        poly.push_back(s.xy[2 * idx]);
        poly.push_back(s.xy[2 * idx + 1]);
      }
      npts = max_points;
    } else {
      poly.assign(s.xy.begin(), s.xy.end());
    }
    float* out = r->points + (size_t)i * max_points * 2;
    for (long k = 0; k < npts; ++k) {
      out[2 * k] = poly[2 * k];
      out[2 * k + 1] = -poly[2 * k + 1];  // y-flip (tablet y grows downward)
    }
    for (long k = npts; k < max_points; ++k) {  // pad with the last point
      out[2 * k] = out[2 * (npts - 1)];
      out[2 * k + 1] = out[2 * (npts - 1) + 1];
    }
    r->lengths[i] = (int32_t)npts;
    if (i) names += '\n';
    names += s.name;
  }
  r->names = strdup(names.c_str());
  r->names_len = (int64_t)names.size();
  return r;
}

void uji_parse_free(UjiParse* r) {
  if (!r) return;
  free(r->points);
  free(r->lengths);
  free(r->names);
  free(r->error);
  free(r);
}

}  // extern "C"
