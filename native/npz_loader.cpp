// Native .npz tile decoder.
//
// The training corpus is thousands of small zlib-compressed .npz files
// (reference src/data/processing_10m/process.py:187); Python's
// zipfile+zlib path decodes them single-threaded under the GIL.  This
// library parses the zip central directory directly and inflates members
// with zlib, exposing a batch API that decodes many files on a C++ thread
// pool — the Python wrapper (maunet_tpu/data/native.py) releases the GIL
// for the whole batch.
//
// C ABI only (consumed via ctypes; pybind11 is not available in this image).

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Entry {
  std::string name;          // member name, e.g. "input.npy"
  uint64_t comp_size = 0;
  uint64_t uncomp_size = 0;  // full .npy member size (header + payload)
  uint64_t local_offset = 0;
  uint16_t method = 0;       // 0 = stored, 8 = deflate
};

struct Npz {
  std::string path;
  std::vector<Entry> entries;
  std::string error;
};

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

bool read_file_range(const std::string& path, uint64_t off, uint64_t len,
                     std::vector<uint8_t>& out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  out.resize(len);
  f.seekg(static_cast<std::streamoff>(off));
  f.read(reinterpret_cast<char*>(out.data()), static_cast<std::streamsize>(len));
  return static_cast<uint64_t>(f.gcount()) == len;
}

bool parse_central_directory(Npz* z) {
  std::ifstream f(z->path, std::ios::binary);
  if (!f) { z->error = "cannot open file"; return false; }
  f.seekg(0, std::ios::end);
  uint64_t fsize = static_cast<uint64_t>(f.tellg());
  uint64_t tail = fsize < 66000 ? fsize : 66000;
  std::vector<uint8_t> buf;
  if (!read_file_range(z->path, fsize - tail, tail, buf)) {
    z->error = "cannot read EOCD region";
    return false;
  }
  // scan backwards for EOCD signature
  int64_t eocd = -1;
  for (int64_t i = static_cast<int64_t>(buf.size()) - 22; i >= 0; --i) {
    if (rd32(&buf[i]) == 0x06054b50) { eocd = i; break; }
  }
  if (eocd < 0) { z->error = "EOCD not found (not a zip?)"; return false; }
  uint16_t n_entries = rd16(&buf[eocd + 10]);
  uint32_t cd_size = rd32(&buf[eocd + 12]);
  uint32_t cd_offset = rd32(&buf[eocd + 16]);

  std::vector<uint8_t> cd;
  if (!read_file_range(z->path, cd_offset, cd_size, cd)) {
    z->error = "cannot read central directory";
    return false;
  }
  uint64_t p = 0;
  for (int i = 0; i < n_entries; ++i) {
    if (p + 46 > cd.size() || rd32(&cd[p]) != 0x02014b50) {
      z->error = "bad central directory entry";
      return false;
    }
    Entry e;
    e.method = rd16(&cd[p + 10]);
    e.comp_size = rd32(&cd[p + 20]);
    e.uncomp_size = rd32(&cd[p + 24]);
    uint16_t name_len = rd16(&cd[p + 28]);
    uint16_t extra_len = rd16(&cd[p + 30]);
    uint16_t comment_len = rd16(&cd[p + 32]);
    e.local_offset = rd32(&cd[p + 42]);
    e.name.assign(reinterpret_cast<const char*>(&cd[p + 46]), name_len);
    z->entries.push_back(std::move(e));
    p += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

const Entry* find_entry(const Npz* z, const std::string& name) {
  for (const auto& e : z->entries) {
    if (e.name == name || e.name == name + ".npy") return &e;
  }
  return nullptr;
}

// Inflate (or copy) the full member bytes of `e` into `out` (uncomp_size).
bool extract_member(const std::string& path, const Entry& e,
                    std::vector<uint8_t>& out, std::string* err) {
  std::vector<uint8_t> local;
  if (!read_file_range(path, e.local_offset, 30, local)) {
    *err = "cannot read local header";
    return false;
  }
  if (rd32(&local[0]) != 0x04034b50) { *err = "bad local header"; return false; }
  uint16_t name_len = rd16(&local[26]);
  uint16_t extra_len = rd16(&local[28]);
  uint64_t data_off = e.local_offset + 30 + name_len + extra_len;

  std::vector<uint8_t> comp;
  if (!read_file_range(path, data_off, e.comp_size, comp)) {
    *err = "cannot read member data";
    return false;
  }
  out.resize(e.uncomp_size);
  if (e.method == 0) {  // stored
    if (e.comp_size != e.uncomp_size) { *err = "stored size mismatch"; return false; }
    std::memcpy(out.data(), comp.data(), comp.size());
    return true;
  }
  if (e.method != 8) { *err = "unsupported compression method"; return false; }
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) { *err = "inflateInit failed"; return false; }
  zs.next_in = comp.data();
  zs.avail_in = static_cast<uInt>(comp.size());
  zs.next_out = out.data();
  zs.avail_out = static_cast<uInt>(out.size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (rc != Z_STREAM_END) { *err = "inflate failed"; return false; }
  return true;
}

// Parse a .npy header: returns payload offset; writes dtype descr + shape.
bool parse_npy_header(const std::vector<uint8_t>& npy, std::string* descr,
                      std::vector<int64_t>* shape, uint64_t* payload_off,
                      std::string* err) {
  if (npy.size() < 10 || std::memcmp(npy.data(), "\x93NUMPY", 6) != 0) {
    *err = "bad npy magic";
    return false;
  }
  uint8_t major = npy[6];
  uint64_t hlen, hoff;
  if (major == 1) {
    hlen = rd16(&npy[8]);
    hoff = 10;
  } else {
    hlen = rd32(&npy[8]);
    hoff = 12;
  }
  if (hoff + hlen > npy.size()) { *err = "truncated npy header"; return false; }
  std::string header(reinterpret_cast<const char*>(&npy[hoff]), hlen);
  *payload_off = hoff + hlen;

  auto find_val = [&](const std::string& key) -> std::string {
    auto k = header.find("'" + key + "'");
    if (k == std::string::npos) return "";
    auto colon = header.find(':', k);
    return header.substr(colon + 1);
  };
  std::string d = find_val("descr");
  auto q1 = d.find('\'');
  auto q2 = d.find('\'', q1 + 1);
  *descr = d.substr(q1 + 1, q2 - q1 - 1);
  if (header.find("'fortran_order': True") != std::string::npos) {
    *err = "fortran order unsupported";
    return false;
  }
  std::string s = find_val("shape");
  auto p1 = s.find('(');
  auto p2 = s.find(')');
  shape->clear();
  std::string inner = s.substr(p1 + 1, p2 - p1 - 1);
  size_t pos = 0;
  while (pos < inner.size()) {
    size_t end = inner.find(',', pos);
    std::string tok = inner.substr(pos, end == std::string::npos
                                            ? std::string::npos : end - pos);
    bool has_digit = false;
    for (char ch : tok) has_digit |= (ch >= '0' && ch <= '9');
    if (has_digit) shape->push_back(std::stoll(tok));
    if (end == std::string::npos) break;
    pos = end + 1;
  }
  return true;
}

std::mutex g_err_mutex;
std::string g_last_error;

void set_error(const std::string& e) {
  std::lock_guard<std::mutex> lock(g_err_mutex);
  g_last_error = e;
}

}  // namespace

extern "C" {

const char* npz_last_error() {
  std::lock_guard<std::mutex> lock(g_err_mutex);
  return g_last_error.c_str();
}

void* npz_open(const char* path) {
  auto* z = new Npz();
  z->path = path;
  if (!parse_central_directory(z)) {
    set_error(z->error);
    delete z;
    return nullptr;
  }
  return z;
}

void npz_close(void* handle) { delete static_cast<Npz*>(handle); }

int npz_num_entries(void* handle) {
  return static_cast<int>(static_cast<Npz*>(handle)->entries.size());
}

const char* npz_entry_name(void* handle, int i) {
  auto* z = static_cast<Npz*>(handle);
  if (i < 0 || i >= static_cast<int>(z->entries.size())) return "";
  return z->entries[i].name.c_str();
}

// Returns payload nbytes, or -1 on error. dtype_out: >=16 chars.
// shape_out: up to 8 dims, ndim written to ndim_out.
long long npz_entry_info(void* handle, const char* name, char* dtype_out,
                         long long* shape_out, int* ndim_out) {
  auto* z = static_cast<Npz*>(handle);
  const Entry* e = find_entry(z, name);
  if (!e) { set_error("entry not found"); return -1; }
  std::vector<uint8_t> npy;
  std::string err;
  if (!extract_member(z->path, *e, npy, &err)) { set_error(err); return -1; }
  std::string descr;
  std::vector<int64_t> shape;
  uint64_t off;
  if (!parse_npy_header(npy, &descr, &shape, &off, &err)) { set_error(err); return -1; }
  std::snprintf(dtype_out, 16, "%s", descr.c_str());
  *ndim_out = static_cast<int>(shape.size());
  for (size_t i = 0; i < shape.size() && i < 8; ++i) shape_out[i] = shape[i];
  return static_cast<long long>(npy.size() - off);
}

// Uncompressed member size (header + payload) from the central directory —
// an upper bound for npz_read_full's buffer, available without inflating.
long long npz_entry_usize(void* handle, const char* name) {
  auto* z = static_cast<Npz*>(handle);
  const Entry* e = find_entry(z, name);
  if (!e) { set_error("entry not found"); return -1; }
  return static_cast<long long>(e->uncomp_size);
}

// Single-pass decode: inflate the member ONCE, parse the npy header, copy
// the payload into out (cap must be >= payload; use npz_entry_usize as an
// upper bound).  Writes dtype/shape metadata.  Returns payload nbytes or -1.
long long npz_read_full(void* handle, const char* name, char* dtype_out,
                        long long* shape_out, int* ndim_out, void* out,
                        long long cap) {
  auto* z = static_cast<Npz*>(handle);
  const Entry* e = find_entry(z, name);
  if (!e) { set_error("entry not found"); return -1; }
  std::vector<uint8_t> npy;
  std::string err;
  if (!extract_member(z->path, *e, npy, &err)) { set_error(err); return -1; }
  std::string descr;
  std::vector<int64_t> shape;
  uint64_t off;
  if (!parse_npy_header(npy, &descr, &shape, &off, &err)) { set_error(err); return -1; }
  uint64_t payload = npy.size() - off;
  if (static_cast<uint64_t>(cap) < payload) { set_error("buffer too small"); return -1; }
  std::snprintf(dtype_out, 16, "%s", descr.c_str());
  *ndim_out = static_cast<int>(shape.size());
  for (size_t i = 0; i < shape.size() && i < 8; ++i) shape_out[i] = shape[i];
  std::memcpy(out, npy.data() + off, payload);
  return static_cast<long long>(payload);
}

// Decode entry payload into out (must hold payload bytes). Returns 0 on ok.
int npz_read(void* handle, const char* name, void* out, long long out_nbytes) {
  auto* z = static_cast<Npz*>(handle);
  const Entry* e = find_entry(z, name);
  if (!e) { set_error("entry not found"); return 1; }
  std::vector<uint8_t> npy;
  std::string err;
  if (!extract_member(z->path, *e, npy, &err)) { set_error(err); return 1; }
  std::string descr;
  std::vector<int64_t> shape;
  uint64_t off;
  if (!parse_npy_header(npy, &descr, &shape, &off, &err)) { set_error(err); return 1; }
  uint64_t payload = npy.size() - off;
  if (static_cast<uint64_t>(out_nbytes) < payload) { set_error("buffer too small"); return 1; }
  std::memcpy(out, npy.data() + off, payload);
  return 0;
}

// Batch: for each of n files, decode `name` into outs[i] (each out_nbytes).
// Decodes on `threads` C++ threads. Returns number of failures.
int npz_read_batch(const char** paths, const char* name, void** outs,
                   const long long* out_nbytes, int n, int threads) {
  if (threads < 1) threads = 1;
  std::vector<int> failures(n, 0);
  std::vector<std::thread> pool;
  std::mutex next_mutex;
  int next = 0;
  auto worker = [&]() {
    for (;;) {
      int i;
      {
        std::lock_guard<std::mutex> lock(next_mutex);
        if (next >= n) return;
        i = next++;
      }
      void* h = npz_open(paths[i]);
      if (!h) { failures[i] = 1; continue; }
      failures[i] = npz_read(h, name, outs[i], out_nbytes[i]);
      npz_close(h);
    }
  };
  for (int t = 0; t < threads && t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  int total = 0;
  for (int f : failures) total += f;
  return total;
}

}  // extern "C"
