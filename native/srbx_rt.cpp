// srbx native host runtime.
//
// TPU-native equivalent of the reference's host-side plumbing:
//  * fixed-rate CPU-pinned control loops — replaces the Unitree SDK's
//    `LoopFunc` threads (`unitree_legged_sdk/include/unitree_legged_sdk/loop.h`,
//    used at `driver_scripts/qp_only_exp.cpp:665-668` to run the 1 ms LL and
//    20 ms HL loops). Each loop invokes a registered callback (in production,
//    a dispatch of pre-compiled jitted step functions) at a fixed period with
//    absolute-deadline scheduling, overrun accounting, and latency
//    percentiles;
//  * a seqlock shared-state store — replaces the boost::mutex-guarded
//    global `sharedData data0..3` (`include/shared_structs.hpp:15-44,298-318`)
//    with lock-free single-writer / multi-reader slots so the 1 kHz loop
//    never blocks on the HL thread;
//  * UDP endpoints — replaces the raw sockets of `include/multi_pc_comm.h`
//    (`RobotSend`/`RobotRecv` exchange) for multi-process / multi-PC
//    bridging.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <atomic>
#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <pthread.h>
#include <sched.h>
#include <sys/socket.h>
#include <unistd.h>

extern "C" {

// ------------------------------------------------------------------ //
//  Fixed-rate loop executor
// ------------------------------------------------------------------ //

typedef void (*srbx_loop_cb)(void* user, int64_t tick);

struct SrbxLoop {
  std::thread thread;
  std::atomic<bool> running{false};
  srbx_loop_cb cb{nullptr};
  void* user{nullptr};
  int64_t period_ns{0};
  int cpu{-1};
  std::atomic<int64_t> ticks{0};
  std::atomic<int64_t> overruns{0};
  // latency reservoir (callback duration, ns)
  std::vector<int64_t> lat;
  std::atomic<size_t> lat_n{0};
};

static void loop_body(SrbxLoop* l) {
  if (l->cpu >= 0) {
    cpu_set_t set;
    CPU_ZERO(&set);
    CPU_SET(l->cpu, &set);
    pthread_setaffinity_np(pthread_self(), sizeof(set), &set);
  }
  using clock = std::chrono::steady_clock;
  auto next = clock::now();
  while (l->running.load(std::memory_order_relaxed)) {
    next += std::chrono::nanoseconds(l->period_ns);
    const int64_t tick = l->ticks.fetch_add(1);
    const auto t0 = clock::now();
    if (l->cb) l->cb(l->user, tick);
    const auto t1 = clock::now();
    const int64_t dur =
        std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0).count();
    const size_t i = l->lat_n.fetch_add(1);
    if (i < l->lat.size()) l->lat[i] = dur;
    if (t1 > next) {
      l->overruns.fetch_add(1);
      next = t1;  // resync after an overrun (no burst catch-up)
    } else {
      std::this_thread::sleep_until(next);
    }
  }
}

void* srbx_loop_create(int64_t period_us, int cpu, srbx_loop_cb cb, void* user) {
  auto* l = new SrbxLoop();
  l->period_ns = period_us * 1000;
  l->cpu = cpu;
  l->cb = cb;
  l->user = user;
  l->lat.resize(1 << 16);
  return l;
}

void srbx_loop_start(void* h) {
  auto* l = static_cast<SrbxLoop*>(h);
  l->running.store(true);
  l->thread = std::thread(loop_body, l);
}

void srbx_loop_stop(void* h) {
  auto* l = static_cast<SrbxLoop*>(h);
  l->running.store(false);
  if (l->thread.joinable()) l->thread.join();
}

int64_t srbx_loop_ticks(void* h) { return static_cast<SrbxLoop*>(h)->ticks.load(); }
int64_t srbx_loop_overruns(void* h) { return static_cast<SrbxLoop*>(h)->overruns.load(); }

// Percentile of callback latency in ns (p in [0,100]).
int64_t srbx_loop_latency_pct(void* h, double p) {
  auto* l = static_cast<SrbxLoop*>(h);
  size_t n = std::min(l->lat_n.load(), l->lat.size());
  if (n == 0) return 0;
  std::vector<int64_t> tmp(l->lat.begin(), l->lat.begin() + n);
  size_t k = static_cast<size_t>(p / 100.0 * (n - 1));
  std::nth_element(tmp.begin(), tmp.begin() + k, tmp.end());
  return tmp[k];
}

void srbx_loop_destroy(void* h) {
  auto* l = static_cast<SrbxLoop*>(h);
  if (l->running.load()) srbx_loop_stop(h);
  delete l;
}

// ------------------------------------------------------------------ //
//  Seqlock shared store
// ------------------------------------------------------------------ //

struct Slot {
  std::atomic<uint64_t> seq{0};
  std::vector<uint8_t> data[2];  // double buffer
};

struct SrbxStore {
  std::vector<Slot> slots;
  size_t slot_bytes;
};

void* srbx_store_create(int n_slots, int slot_bytes) {
  auto* s = new SrbxStore();
  s->slots = std::vector<Slot>(n_slots);
  s->slot_bytes = slot_bytes;
  for (auto& sl : s->slots) {
    sl.data[0].assign(slot_bytes, 0);
    sl.data[1].assign(slot_bytes, 0);
  }
  return s;
}

// Single writer per slot: bump seq to odd, write inactive buffer, publish.
void srbx_store_write(void* h, int slot, const uint8_t* buf, int len) {
  auto* s = static_cast<SrbxStore*>(h);
  Slot& sl = s->slots[slot];
  const uint64_t seq = sl.seq.load(std::memory_order_relaxed);
  const int nxt = static_cast<int>((seq >> 1) & 1) ^ 1;
  std::memcpy(sl.data[nxt].data(), buf,
              std::min<size_t>(len, s->slot_bytes));
  // publish: odd (in progress) -> even with flipped buffer index encoded
  sl.seq.store(seq + 1, std::memory_order_release);   // odd: writing
  sl.seq.store(seq + 2, std::memory_order_release);   // even: published
}

// Readers retry until they observe a stable even sequence.
int srbx_store_read(void* h, int slot, uint8_t* buf, int len) {
  auto* s = static_cast<SrbxStore*>(h);
  Slot& sl = s->slots[slot];
  for (int attempt = 0; attempt < 1000; ++attempt) {
    const uint64_t s0 = sl.seq.load(std::memory_order_acquire);
    if (s0 & 1) continue;  // write in progress
    const int cur = static_cast<int>((s0 >> 1) & 1);
    std::memcpy(buf, sl.data[cur].data(),
                std::min<size_t>(len, s->slot_bytes));
    std::atomic_thread_fence(std::memory_order_acquire);
    if (sl.seq.load(std::memory_order_acquire) == s0) return 0;
  }
  return -1;
}

uint64_t srbx_store_version(void* h, int slot) {
  // seq advances by 2 per published write
  return static_cast<SrbxStore*>(h)->slots[slot].seq.load() >> 1;
}

void srbx_store_destroy(void* h) { delete static_cast<SrbxStore*>(h); }

// ------------------------------------------------------------------ //
//  UDP transport
// ------------------------------------------------------------------ //

int srbx_udp_open(int bind_port) {
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  if (bind_port > 0) {
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = INADDR_ANY;
    addr.sin_port = htons(static_cast<uint16_t>(bind_port));
    if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
      close(fd);
      return -1;
    }
  }
  return fd;
}

int srbx_udp_send(int fd, const char* ip, int port, const uint8_t* buf, int len) {
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  inet_pton(AF_INET, ip, &addr.sin_addr);
  return static_cast<int>(sendto(fd, buf, len, 0,
                                 reinterpret_cast<sockaddr*>(&addr),
                                 sizeof(addr)));
}

int srbx_udp_recv(int fd, uint8_t* buf, int len, int timeout_ms) {
  timeval tv{timeout_ms / 1000, (timeout_ms % 1000) * 1000};
  setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  return static_cast<int>(recv(fd, buf, len, 0));
}

void srbx_udp_close(int fd) { close(fd); }

}  // extern "C"
