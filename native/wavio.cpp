// Native audio IO + batch data loader for audioflux_tpu.
//
// TPU-native counterpart of the reference's C WAV layer
// (src/util/flux_wave.c): RIFF/WAVE PCM decode (8/16/24/32-bit int and
// 32-bit float), encode, and a multithreaded batch loader that decodes many
// files into one contiguous float32 [batch, length] buffer ready for
// host->device transfer. Built as libafio.so, bound via ctypes
// (audioflux_tpu/io/native.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  uint16_t format = 0;  // 1 = PCM, 3 = float
  long data_offset = 0;
  uint32_t data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char tag[4];
  uint32_t sz;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4) != 0) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "WAVE", 4) != 0) return false;
  while (fread(tag, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (memcmp(tag, "fmt ", 4) == 0) {
      uint16_t fmt, ch;
      uint32_t sr, br;
      uint16_t ba, bits;
      if (fread(&fmt, 2, 1, f) != 1 || fread(&ch, 2, 1, f) != 1 ||
          fread(&sr, 4, 1, f) != 1 || fread(&br, 4, 1, f) != 1 ||
          fread(&ba, 2, 1, f) != 1 || fread(&bits, 2, 1, f) != 1)
        return false;
      info->format = fmt;
      info->channels = ch;
      info->sample_rate = sr;
      info->bits = bits;
      if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
    } else if (memcmp(tag, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = sz;
      return info->channels > 0 && info->bits > 0;
    } else {
      fseek(f, (sz + 1) & ~1u, SEEK_CUR);
    }
  }
  return false;
}

// Decode interleaved samples to float32 [-1, 1); optional mono mixdown.
long decode(FILE* f, const WavInfo& info, float* out, long max_frames,
            int mix_mono) {
  const int ch = info.channels;
  const int bytes = info.bits / 8;
  long frames = info.data_bytes / (bytes * ch);
  if (max_frames > 0 && frames > max_frames) frames = max_frames;
  std::vector<uint8_t> raw(static_cast<size_t>(frames) * bytes * ch);
  fseek(f, info.data_offset, SEEK_SET);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) return -1;

  const int out_ch = mix_mono ? 1 : ch;
  for (long i = 0; i < frames; i++) {
    float acc = 0.f;
    for (int c = 0; c < ch; c++) {
      const uint8_t* p = raw.data() + (static_cast<size_t>(i) * ch + c) * bytes;
      float v = 0.f;
      if (info.format == 3 && info.bits == 32) {
        float fv;
        memcpy(&fv, p, 4);
        v = fv;
      } else if (info.bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = s / 32768.f;
      } else if (info.bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = s / 2147483648.f;
      } else if (info.bits == 24) {
        int32_t s = (p[0] | (p[1] << 8) | (p[2] << 16));
        if (s & 0x800000) s |= ~0xFFFFFF;
        v = s / 8388608.f;
      } else if (info.bits == 8) {
        v = (p[0] - 128) / 128.f;
      }
      if (mix_mono) {
        acc += v;
      } else {
        out[i * out_ch + c] = v;
      }
    }
    if (mix_mono) out[i] = acc / ch;
  }
  return frames;
}

}  // namespace

extern "C" {

// Returns frame count (per channel), fills samplate/channels; -1 on error.
long afio_wav_info(const char* path, int* samplate, int* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  if (!ok) return -1;
  if (samplate) *samplate = static_cast<int>(info.sample_rate);
  if (channels) *channels = info.channels;
  return info.data_bytes / (info.bits / 8 * info.channels);
}

// Decode up to max_frames frames into out (size max_frames * channels or
// max_frames when mix_mono). Returns decoded frame count, -1 on error.
long afio_wav_read(const char* path, float* out, long max_frames,
                   int mix_mono) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return -1;
  }
  long n = decode(f, info, out, max_frames, mix_mono);
  fclose(f);
  return n;
}

// Write mono/interleaved float32 data as 16-bit PCM.
int afio_wav_write(const char* path, const float* data, long frames,
                   int channels, int samplate) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_bytes = static_cast<uint32_t>(frames) * channels * 2;
  uint32_t riff = 36 + data_bytes;
  uint16_t fmt = 1, ch = static_cast<uint16_t>(channels), bits = 16;
  uint32_t sr = static_cast<uint32_t>(samplate);
  uint32_t br = sr * ch * 2;
  uint16_t ba = ch * 2;
  uint32_t fmt_sz = 16;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff, 4, 1, f);
  fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  fwrite(&fmt_sz, 4, 1, f);
  fwrite(&fmt, 2, 1, f);
  fwrite(&ch, 2, 1, f);
  fwrite(&sr, 4, 1, f);
  fwrite(&br, 4, 1, f);
  fwrite(&ba, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_bytes, 4, 1, f);
  std::vector<int16_t> pcm(static_cast<size_t>(frames) * channels);
  for (size_t i = 0; i < pcm.size(); i++) {
    float v = data[i];
    if (v > 1.f) v = 1.f;
    if (v < -1.f) v = -1.f;
    pcm[i] = static_cast<int16_t>(v * 32767.f);
  }
  fwrite(pcm.data(), 2, pcm.size(), f);
  fclose(f);
  return 0;
}

// Decode `count` files (newline-joined paths) into out[count * length],
// mono-mixed, truncated/zero-padded to `length` frames each, using
// `num_threads` worker threads. Returns number of successfully decoded
// files; rows of failed files are zero.
int afio_load_batch(const char* paths_joined, int count, float* out,
                    long length, int num_threads) {
  std::vector<std::string> paths;
  {
    const char* p = paths_joined;
    for (int i = 0; i < count; i++) {
      const char* nl = strchr(p, '\n');
      size_t len = nl ? static_cast<size_t>(nl - p) : strlen(p);
      paths.emplace_back(p, len);
      if (!nl) break;
      p = nl + 1;
    }
  }
  if (static_cast<int>(paths.size()) < count) count = paths.size();
  if (num_threads < 1) num_threads = 1;

  std::vector<int> ok(count, 0);
  auto worker = [&](int tid) {
    for (int i = tid; i < count; i += num_threads) {
      float* row = out + static_cast<long>(i) * length;
      memset(row, 0, sizeof(float) * length);
      long n = afio_wav_read(paths[i].c_str(), row, length, 1);
      ok[i] = n > 0 ? 1 : 0;
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; t++) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
  int good = 0;
  for (int v : ok) good += v;
  return good;
}

// ---------------------------------------------------------------------------
// Async prefetch pool: persistent worker threads decode whole batches in the
// background so the host can overlap disk decode with device compute (the
// input-pipeline half of a serving loop).  Submit returns a job id at once;
// wait blocks until that batch's buffer is fully written.  Bound via ctypes
// (audioflux_tpu/io/native.py PrefetchLoader).

namespace {

struct PoolJob {
  std::vector<std::string> paths;
  float* out = nullptr;
  long length = 0;
  std::atomic<int> next{0};
  std::atomic<int> remaining{0};
  std::atomic<int> good{0};
};

struct Pool {
  std::mutex mu;
  std::condition_variable cv;       // workers: work available / stop
  std::condition_variable done_cv;  // waiters: a job finished
  std::deque<std::shared_ptr<PoolJob>> active;  // jobs with unclaimed tasks
  std::unordered_map<int, std::shared_ptr<PoolJob>> jobs;
  int next_id = 1;
  bool stop = false;
  std::vector<std::thread> workers;
};

void pool_worker(Pool* pool) {
  for (;;) {
    std::shared_ptr<PoolJob> job;
    int index = -1;
    {
      std::unique_lock<std::mutex> lk(pool->mu);
      pool->cv.wait(lk, [&] { return pool->stop || !pool->active.empty(); });
      if (pool->stop) return;
      job = pool->active.front();
      index = job->next++;
      if (job->next >= static_cast<int>(job->paths.size()))
        pool->active.pop_front();
    }
    float* row = job->out + static_cast<long>(index) * job->length;
    memset(row, 0, sizeof(float) * job->length);
    long n = afio_wav_read(job->paths[index].c_str(), row, job->length, 1);
    if (n > 0) job->good++;
    if (--job->remaining == 0) {
      std::lock_guard<std::mutex> lk(pool->mu);
      pool->done_cv.notify_all();
    }
  }
}

}  // namespace

// Create a pool of `num_threads` persistent decode workers.
void* afio_pool_create(int num_threads) {
  if (num_threads < 1) num_threads = 1;
  Pool* pool = new Pool();
  for (int t = 0; t < num_threads; t++)
    pool->workers.emplace_back(pool_worker, pool);
  return pool;
}

// Queue a batch decode (newline-joined paths -> out[count * length], mono,
// truncate/zero-pad).  `out` must stay alive until afio_pool_wait returns.
// Returns a job id (> 0), or -1 on bad arguments.
int afio_pool_submit(void* handle, const char* paths_joined, int count,
                     float* out, long length) {
  Pool* pool = static_cast<Pool*>(handle);
  if (!pool || !out || count < 1 || length < 1) return -1;
  auto job = std::make_shared<PoolJob>();
  const char* p = paths_joined;
  for (int i = 0; i < count; i++) {
    const char* nl = strchr(p, '\n');
    size_t len = nl ? static_cast<size_t>(nl - p) : strlen(p);
    job->paths.emplace_back(p, len);
    if (!nl) break;
    p = nl + 1;
  }
  job->out = out;
  job->length = length;
  job->remaining = static_cast<int>(job->paths.size());
  int id;
  {
    std::lock_guard<std::mutex> lk(pool->mu);
    id = pool->next_id++;
    pool->jobs[id] = job;
    pool->active.push_back(job);
  }
  pool->cv.notify_all();
  return id;
}

// Block until job `id` completes; returns its decoded-file count, or -1 for
// an unknown id.  The job's buffer is fully written on return.
int afio_pool_wait(void* handle, int id) {
  Pool* pool = static_cast<Pool*>(handle);
  if (!pool) return -1;
  std::shared_ptr<PoolJob> job;
  {
    std::unique_lock<std::mutex> lk(pool->mu);
    auto it = pool->jobs.find(id);
    if (it == pool->jobs.end()) return -1;
    job = it->second;
    pool->done_cv.wait(lk, [&] { return job->remaining.load() == 0; });
    pool->jobs.erase(id);
  }
  return job->good.load();
}

// Join and free the pool.  Call only after waiting on all submitted jobs.
void afio_pool_destroy(void* handle) {
  Pool* pool = static_cast<Pool*>(handle);
  if (!pool) return;
  {
    std::lock_guard<std::mutex> lk(pool->mu);
    pool->stop = true;
  }
  pool->cv.notify_all();
  for (auto& th : pool->workers) th.join();
  delete pool;
}

}  // extern "C"
