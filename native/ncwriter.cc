// Native netCDF-3 (classic) writer with an asynchronous writer thread.
//
// The runtime I/O layer of the framework: the reference model's output
// path is Fortran netCDF calls on the compute thread (src/nc_subs.F);
// here snapshot frames are handed off to a background thread so the
// device step loop never stalls on disk.  The classic file format is
// emitted directly (header: magic 'CDF\1', dim/att/var lists,
// big-endian data, 4-byte alignment, record variables interleaved per
// record) -- no libnetcdf dependency.
//
// C ABI (used from Python via ctypes, qgcm_tpu/io/native.py):
//   qgnc_create(path)                         -> handle (>=0) | -1
//   qgnc_def_dim(h, name, len)                -> dimid   (len 0 = record)
//   qgnc_def_var(h, name, xtype, nd, dimids)  -> varid   (xtype 5=f32 6=f64)
//   qgnc_put_att_text(h, varid, name, text)   -> 0
//   qgnc_enddef(h)                            -> 0
//   qgnc_put(h, varid, rec, data)             -> 0   (synchronous)
//   qgnc_put_async(h, varid, rec, data)       -> 0   (copies + enqueues)
//   qgnc_flush(h)                             -> 0   (drain the queue)
//   qgnc_close(h)                             -> 0
//
// Limitations (by design, matching this framework's outputs): define
// mode must precede all puts; text attributes only; f32/f64 data with
// the in-memory dtype matching the variable xtype.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int NC_FLOAT = 5;
constexpr int NC_DOUBLE = 6;

inline uint32_t be32(uint32_t v) {
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
  return __builtin_bswap32(v);
#else
  return v;
#endif
}

struct Dim {
  std::string name;
  uint32_t len;       // 0 => record dimension
};

struct Var {
  std::string name;
  int xtype;
  std::vector<int> dimids;
  std::vector<std::pair<std::string, std::string>> atts;
  bool is_record = false;
  uint64_t vsize = 0;      // aligned bytes per record (or total)
  uint64_t begin = 0;
  uint64_t nelems = 0;     // elements per record slab
};

struct WriteJob {
  int varid;
  uint32_t rec;
  std::vector<uint8_t> data;   // big-endian converted
};

class NcFile {
 public:
  explicit NcFile(const std::string& path) : path_(path) {}

  int def_dim(const std::string& name, uint32_t len) {
    dims_.push_back({name, len});
    return static_cast<int>(dims_.size()) - 1;
  }

  int def_var(const std::string& name, int xtype, int nd,
              const int* dimids) {
    Var v;
    v.name = name;
    v.xtype = xtype;
    v.dimids.assign(dimids, dimids + nd);
    if (nd > 0 && dims_[v.dimids[0]].len == 0) v.is_record = true;
    vars_.push_back(std::move(v));
    return static_cast<int>(vars_.size()) - 1;
  }

  void put_att(int varid, const std::string& name,
               const std::string& text) {
    vars_[varid].atts.push_back({name, text});
  }

  int enddef() {
    fp_ = std::fopen(path_.c_str(), "wb");
    if (!fp_) return -1;
    layout();
    write_header();
    // reserve non-record data region
    if (data_begin_ < first_record_begin_) {
      std::fseek(fp_, static_cast<long>(first_record_begin_) - 1, SEEK_SET);
      std::fputc(0, fp_);
    }
    writer_ = std::thread([this] { this->drain(); });
    defined_ = true;
    return 0;
  }

  int put(int varid, uint32_t rec, const void* data, bool async) {
    const Var& v = vars_[varid];
    size_t esz = (v.xtype == NC_DOUBLE) ? 8 : 4;
    size_t nbytes = v.nelems * esz;
    WriteJob job;
    job.varid = varid;
    job.rec = rec;
    job.data.resize(nbytes);
    // byteswap to big-endian
    const uint8_t* src = static_cast<const uint8_t*>(data);
    uint8_t* dst = job.data.data();
    if (esz == 4) {
      for (size_t i = 0; i < nbytes; i += 4) {
        dst[i] = src[i + 3]; dst[i + 1] = src[i + 2];
        dst[i + 2] = src[i + 1]; dst[i + 3] = src[i];
      }
    } else {
      for (size_t i = 0; i < nbytes; i += 8)
        for (size_t b = 0; b < 8; ++b) dst[i + b] = src[i + 7 - b];
    }
    if (async) {
      std::unique_lock<std::mutex> lk(mu_);
      queue_.push_back(std::move(job));
      cv_.notify_one();
    } else {
      do_write(job);
    }
    if (v.is_record && rec + 1 > numrecs_) {
      std::unique_lock<std::mutex> lk(mu_);
      numrecs_ = rec + 1;
    }
    return 0;
  }

  void flush() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_done_.wait(lk, [this] { return queue_.empty() && !busy_; });
    std::fflush(fp_);
  }

  int close() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
      cv_.notify_one();
    }
    if (writer_.joinable()) writer_.join();
    // patch numrecs
    std::fseek(fp_, 4, SEEK_SET);
    uint32_t nr = be32(numrecs_);
    std::fwrite(&nr, 4, 1, fp_);
    std::fclose(fp_);
    fp_ = nullptr;
    return 0;
  }

 private:
  static uint64_t align4(uint64_t n) { return (n + 3) & ~uint64_t(3); }

  void layout() {
    // element counts and sizes
    for (auto& v : vars_) {
      uint64_t n = 1;
      for (size_t d = v.is_record ? 1 : 0; d < v.dimids.size(); ++d)
        n *= dims_[v.dimids[d]].len;
      v.nelems = n;
      uint64_t esz = (v.xtype == NC_DOUBLE) ? 8 : 4;
      v.vsize = align4(n * esz);
    }
    uint64_t off = header_size();
    data_begin_ = off;
    for (auto& v : vars_)
      if (!v.is_record) { v.begin = off; off += v.vsize; }
    first_record_begin_ = off;
    // netCDF classic special case: with exactly one record variable
    // the record slabs are NOT 4-byte aligned.
    int nrec_vars = 0;
    for (auto& v : vars_) nrec_vars += v.is_record ? 1 : 0;
    recsize_ = 0;
    for (auto& v : vars_) {
      if (!v.is_record) continue;
      if (nrec_vars == 1) {
        uint64_t esz = (v.xtype == NC_DOUBLE) ? 8 : 4;
        v.vsize = v.nelems * esz;
      }
      v.begin = off + recsize_;
      recsize_ += v.vsize;
    }
  }

  uint64_t str_size(const std::string& s) const {
    return 4 + align4(s.size());
  }

  uint64_t atts_size(const std::vector<std::pair<std::string,
                                                 std::string>>& atts) const {
    if (atts.empty()) return 8;          // ABSENT
    uint64_t sz = 8;                      // NC_ATTRIBUTE tag + count
    for (auto& a : atts)
      sz += str_size(a.first) + 4 + 4 + align4(a.second.size());
    return sz;
  }

  uint64_t header_size() const {
    uint64_t sz = 4 + 4;                  // magic + numrecs
    sz += 8;                              // dim_list tag + count
    for (auto& d : dims_) sz += str_size(d.name) + 4;
    sz += 8;                              // global atts ABSENT
    sz += 8;                              // var_list tag + count
    for (auto& v : vars_) {
      sz += str_size(v.name) + 4 + 4 * v.dimids.size();
      sz += atts_size(v.atts);
      sz += 4 + 4 + 4;                    // xtype + vsize + begin
    }
    return sz;
  }

  void w32(uint32_t v) { uint32_t b = be32(v); std::fwrite(&b, 4, 1, fp_); }

  void wstr(const std::string& s) {
    w32(static_cast<uint32_t>(s.size()));
    std::fwrite(s.data(), 1, s.size(), fp_);
    for (uint64_t i = s.size(); i % 4; ++i) std::fputc(0, fp_);
  }

  void write_header() {
    std::fwrite("CDF\x01", 1, 4, fp_);
    w32(0);                               // numrecs, patched at close
    w32(dims_.empty() ? 0 : 10);          // NC_DIMENSION
    w32(static_cast<uint32_t>(dims_.size()));
    for (auto& d : dims_) { wstr(d.name); w32(d.len); }
    w32(0); w32(0);                       // global atts ABSENT
    w32(vars_.empty() ? 0 : 11);          // NC_VARIABLE
    w32(static_cast<uint32_t>(vars_.size()));
    for (auto& v : vars_) {
      wstr(v.name);
      w32(static_cast<uint32_t>(v.dimids.size()));
      for (int d : v.dimids) w32(static_cast<uint32_t>(d));
      if (v.atts.empty()) { w32(0); w32(0); }
      else {
        w32(12);                          // NC_ATTRIBUTE
        w32(static_cast<uint32_t>(v.atts.size()));
        for (auto& a : v.atts) {
          wstr(a.first);
          w32(2);                         // NC_CHAR
          w32(static_cast<uint32_t>(a.second.size()));
          std::fwrite(a.second.data(), 1, a.second.size(), fp_);
          for (uint64_t i = a.second.size(); i % 4; ++i)
            std::fputc(0, fp_);
        }
      }
      w32(static_cast<uint32_t>(v.xtype));
      w32(static_cast<uint32_t>(v.vsize));
      w32(static_cast<uint32_t>(v.begin));
    }
  }

  void do_write(const WriteJob& job) {
    const Var& v = vars_[job.varid];
    uint64_t off = v.begin + (v.is_record
                              ? uint64_t(job.rec) * recsize_ : 0);
    std::unique_lock<std::mutex> flk(fmu_);
    std::fseek(fp_, static_cast<long>(off), SEEK_SET);
    std::fwrite(job.data.data(), 1, job.data.size(), fp_);
  }

  void drain() {
    for (;;) {
      WriteJob job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        job = std::move(queue_.front());
        queue_.pop_front();
        busy_ = true;
      }
      do_write(job);
      {
        std::unique_lock<std::mutex> lk(mu_);
        busy_ = false;
        if (queue_.empty()) cv_done_.notify_all();
      }
    }
  }

  std::string path_;
  std::FILE* fp_ = nullptr;
  std::vector<Dim> dims_;
  std::vector<Var> vars_;
  uint64_t data_begin_ = 0, first_record_begin_ = 0, recsize_ = 0;
  uint32_t numrecs_ = 0;
  bool defined_ = false;
  std::deque<WriteJob> queue_;
  std::mutex mu_, fmu_;
  std::condition_variable cv_, cv_done_;
  std::thread writer_;
  bool stop_ = false, busy_ = false;
};

std::mutex g_mu;
std::vector<std::unique_ptr<NcFile>> g_files;

}  // namespace

extern "C" {

int qgnc_create(const char* path) {
  std::unique_lock<std::mutex> lk(g_mu);
  g_files.push_back(std::make_unique<NcFile>(path));
  return static_cast<int>(g_files.size()) - 1;
}

int qgnc_def_dim(int h, const char* name, int len) {
  return g_files[h]->def_dim(name, len < 0 ? 0 : len);
}

int qgnc_def_var(int h, const char* name, int xtype, int nd,
                 const int* dimids) {
  return g_files[h]->def_var(name, xtype, nd, dimids);
}

int qgnc_put_att_text(int h, int varid, const char* name,
                      const char* text) {
  g_files[h]->put_att(varid, name, text);
  return 0;
}

int qgnc_enddef(int h) { return g_files[h]->enddef(); }

int qgnc_put(int h, int varid, int rec, const void* data) {
  return g_files[h]->put(varid, rec, data, /*async=*/false);
}

int qgnc_put_async(int h, int varid, int rec, const void* data) {
  return g_files[h]->put(varid, rec, data, /*async=*/true);
}

int qgnc_flush(int h) {
  g_files[h]->flush();
  return 0;
}

int qgnc_close(int h) { return g_files[h]->close(); }

}  // extern "C"
