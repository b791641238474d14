// specforge-tpu network feature store server.
//
// The cross-host tensor plane for disaggregated training — the TPU-native
// replacement for the reference's Mooncake RDMA object store (SURVEY §2.9 #8):
// a host-RAM object store with a length-prefixed binary protocol over TCP/DCN.
// Producer hosts PUT raw tensor buffers (shape/dtype ride in the SampleRef
// metadata, never serialized blobs); trainer hosts GET into preallocated
// buffers and DEL at the optimizer-durable ack. Lifetime semantics match the
// reference store contract (mooncake_store.py:161-860): objects are
// hard-pinned by their lifetime authority (no LRU; ops 'I'/'U' manage pins,
// DEL refuses pinned objects), a max-hold GC sweep ('C') collects unpinned
// leaks, and puts above the byte budget are refused loudly so producer flow
// control is the graceful path. Optional shared-secret auth ('A', --secret /
// SPECFORGE_STORE_SECRET) mirrors the reference SharedDir AuthPolicy
// (data_plane/disaggregated.py:52-69).
//
// Protocol (all integers little-endian):
//   request:  op:u8  key_len:u32  key[key_len]  payload_len:u64  payload
//     op 'A' = auth (payload = shared secret; required first when configured)
//     op 'P' = put (payload = object bytes)
//     op 'G' = get (payload empty)
//     op 'D' = del (payload empty; refuses pinned)
//     op 'I' = pin (payload empty)
//     op 'U' = unpin (payload empty)
//     op 'C' = gc sweep (payload = u64 max age seconds; deletes unpinned
//              objects untouched for longer; response = JSON count)
//     op 'S' = stat (payload empty; response = JSON counters)
//     op 'Q' = quit connection
//   response: status:u8 ('0' ok, '1' missing, '2' over-budget, '3' error,
//                        '4' auth required/failed, '5' pinned)
//             payload_len:u64  payload
//
// GETs are zero-copy server-side: the object buffer is shared_ptr-held, so
// the socket write happens outside the store lock without duplicating the
// bytes (the reference documents the same no-lock-across-RPC rule,
// mooncake_store.py:47-55).
//
// Build: make -C cpp   (g++ -O2 -pthread, no external deps)

#include <arpa/inet.h>
#include <atomic>
#include <cerrno>
#include <chrono>
#include <condition_variable>
#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <mutex>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <string>
#include <sys/socket.h>
#include <sys/time.h>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

using Buffer = std::shared_ptr<const std::vector<uint8_t>>;

uint64_t now_seconds() {
  return static_cast<uint64_t>(
      std::chrono::duration_cast<std::chrono::seconds>(
          std::chrono::steady_clock::now().time_since_epoch())
          .count());
}

struct Object {
  Buffer data;
  uint32_t pins = 0;
  uint64_t last_touch = 0;
};

struct Store {
  std::mutex mu;
  std::unordered_map<std::string, Object> objects;
  uint64_t resident_bytes = 0;
  uint64_t max_bytes = 0;  // 0 = unlimited
  uint64_t puts = 0, gets = 0, dels = 0, rejected = 0, swept = 0;
  uint64_t timeouts = 0;   // connections dropped by a mid-frame I/O stall
  std::string secret;  // empty = auth disabled
};

Store g_store;

// Fan-in guards (multi-trainer-host hardening):
//  - connection cap with ACCEPT BACKPRESSURE: the accept loop blocks while
//    the cap is reached, so excess peers queue in the kernel backlog
//    instead of spawning unbounded threads (the graceful path — a peer
//    sees a slow connect, not a dropped one);
//  - per-frame I/O timeout: a peer that stalls MID-FRAME (truncated frame,
//    dead socket, pathologically slow reader of a GET response) is
//    dropped after --frame-timeout-seconds instead of pinning its thread
//    forever. Idle-at-frame-boundary connections are NOT subject to it —
//    consumers legitimately idle between requests, so the wait for the
//    next op byte carries no timeout.
int g_max_connections = 64;
int g_frame_timeout_s = 60;
std::mutex g_conn_mu;
std::condition_variable g_conn_cv;
int g_active_connections = 0;

void set_recv_timeout(int fd, int seconds) {
  timeval tv{};
  tv.tv_sec = seconds;
  ::setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
}

void set_send_timeout(int fd, int seconds) {
  timeval tv{};
  tv.tv_sec = seconds;
  ::setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
}

bool read_exact(int fd, void* buf, size_t n) {
  auto* p = static_cast<uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::recv(fd, p, n, 0);
    if (r <= 0) {
      if (r < 0 && (errno == EINTR)) continue;
      if (r < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
        // SO_RCVTIMEO expired mid-frame: truncated frame or dead peer
        std::lock_guard<std::mutex> lock(g_store.mu);
        g_store.timeouts++;
        return false;
      }
      return false;
    }
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

bool write_exact(int fd, const void* buf, size_t n) {
  auto* p = static_cast<const uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::send(fd, p, n, MSG_NOSIGNAL);
    if (r <= 0) {
      if (r < 0 && errno == EINTR) continue;
      if (r < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
        // SO_SNDTIMEO expired: slow consumer stalled a response write
        std::lock_guard<std::mutex> lock(g_store.mu);
        g_store.timeouts++;
        return false;
      }
      return false;
    }
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

// Read-and-discard without allocating payload_len bytes: unauthenticated
// peers must not be able to command arbitrary allocations (bad_alloc in a
// connection thread would terminate the whole store).
bool drain_payload(int fd, uint64_t len) {
  uint8_t buf[1 << 16];
  while (len > 0) {
    size_t chunk = len < sizeof(buf) ? static_cast<size_t>(len) : sizeof(buf);
    if (!read_exact(fd, buf, chunk)) return false;
    len -= chunk;
  }
  return true;
}

bool send_response(int fd, char status, const void* payload, uint64_t len) {
  uint8_t header[9];
  header[0] = static_cast<uint8_t>(status);
  std::memcpy(header + 1, &len, 8);
  if (!write_exact(fd, header, sizeof(header))) return false;
  if (len > 0 && !write_exact(fd, payload, len)) return false;
  return true;
}

void handle_connection(int fd) {
  int one = 1;
  ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  if (g_frame_timeout_s > 0) set_send_timeout(fd, g_frame_timeout_s);
  bool authed = g_store.secret.empty();
  for (;;) {
    uint8_t op;
    set_recv_timeout(fd, 0);  // idle between frames is legitimate
    if (!read_exact(fd, &op, 1)) break;
    // the frame has started: a stall from here on is a fault
    if (g_frame_timeout_s > 0) set_recv_timeout(fd, g_frame_timeout_s);
    if (op == 'Q') break;
    uint32_t key_len = 0;
    if (!read_exact(fd, &key_len, 4)) break;
    if (key_len > (1u << 20)) break;  // absurd key: protocol desync
    std::string key(key_len, '\0');
    if (key_len && !read_exact(fd, key.data(), key_len)) break;
    uint64_t payload_len = 0;
    if (!read_exact(fd, &payload_len, 8)) break;

    if (op == 'A') {
      if (payload_len > 4096) {  // no real secret is this long
        drain_payload(fd, payload_len);
        send_response(fd, '4', nullptr, 0);
        break;
      }
      std::string provided(payload_len, '\0');
      if (payload_len && !read_exact(fd, provided.data(), payload_len)) break;
      if (g_store.secret.empty() || provided == g_store.secret) {
        authed = true;
        if (!send_response(fd, '0', nullptr, 0)) break;
      } else {
        send_response(fd, '4', nullptr, 0);
        break;  // failed auth: drop the connection
      }
      continue;
    }
    if (!authed) {
      // bounded drain (never allocate attacker-controlled sizes), refuse, drop
      if (!drain_payload(fd, payload_len)) break;
      send_response(fd, '4', nullptr, 0);
      break;
    }

    if (op == 'P') {
      bool over_budget = false;
      if (g_store.max_bytes != 0) {
        // refuse BEFORE allocating: check against the current residency,
        // not just the absolute budget — a near-full store must not make
        // transient full-payload allocations (bad_alloc would terminate
        // the whole server). The post-read in-lock check below stays as
        // the authoritative race-free decision.
        std::lock_guard<std::mutex> lock(g_store.mu);
        auto it = g_store.objects.find(key);
        uint64_t existing =
            it == g_store.objects.end() ? 0 : it->second.data->size();
        over_budget =
            g_store.resident_bytes - existing + payload_len >
            g_store.max_bytes;
      }
      if (over_budget) {
        if (!drain_payload(fd, payload_len)) break;
        {
          std::lock_guard<std::mutex> lock(g_store.mu);
          g_store.rejected++;
        }
        if (!send_response(fd, '2', nullptr, 0)) break;
        continue;
      }
      auto payload = std::make_shared<std::vector<uint8_t>>(payload_len);
      if (payload_len && !read_exact(fd, payload->data(), payload_len)) break;
      char status = '0';
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        auto it = g_store.objects.find(key);
        uint64_t existing =
            it == g_store.objects.end() ? 0 : it->second.data->size();
        uint64_t next = g_store.resident_bytes - existing + payload_len;
        if (g_store.max_bytes != 0 && next > g_store.max_bytes) {
          status = '2';
          g_store.rejected++;
        } else {
          g_store.resident_bytes = next;
          Object& obj = g_store.objects[key];
          obj.data = std::move(payload);
          obj.last_touch = now_seconds();
          g_store.puts++;
        }
      }
      if (!send_response(fd, status, nullptr, 0)) break;
    } else if (op == 'G') {
      Buffer data;
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        auto it = g_store.objects.find(key);
        if (it != g_store.objects.end()) {
          data = it->second.data;  // refcount only — no byte copy
          it->second.last_touch = now_seconds();
          g_store.gets++;
        }
      }
      if (data) {
        if (!send_response(fd, '0', data->data(), data->size())) break;
      } else {
        if (!send_response(fd, '1', nullptr, 0)) break;
      }
    } else if (op == 'D') {
      char status = '0';
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        auto it = g_store.objects.find(key);
        if (it != g_store.objects.end()) {
          if (it->second.pins > 0) {
            status = '5';
          } else {
            g_store.resident_bytes -= it->second.data->size();
            g_store.objects.erase(it);
            g_store.dels++;
          }
        }
      }
      if (!send_response(fd, status, nullptr, 0)) break;
    } else if (op == 'I' || op == 'U') {
      char status = '0';
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        auto it = g_store.objects.find(key);
        if (it == g_store.objects.end()) {
          status = '1';
        } else if (op == 'I') {
          it->second.pins++;
        } else if (it->second.pins > 0) {
          it->second.pins--;
        }
      }
      if (!send_response(fd, status, nullptr, 0)) break;
    } else if (op == 'C') {
      uint64_t max_age = 0;
      if (payload_len == 8) {
        if (!read_exact(fd, &max_age, 8)) break;
      } else if (payload_len != 0) {
        if (!drain_payload(fd, payload_len)) break;
      }
      uint64_t cutoff = now_seconds() >= max_age
                            ? now_seconds() - max_age
                            : 0;
      uint64_t removed = 0;
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        for (auto it = g_store.objects.begin();
             it != g_store.objects.end();) {
          if (it->second.pins == 0 && it->second.last_touch <= cutoff) {
            g_store.resident_bytes -= it->second.data->size();
            it = g_store.objects.erase(it);
            removed++;
            g_store.swept++;
          } else {
            ++it;
          }
        }
      }
      char buf[64];
      int n = std::snprintf(buf, sizeof(buf), "{\"removed\":%llu}",
                            (unsigned long long)removed);
      if (!send_response(fd, '0', buf, static_cast<uint64_t>(n))) break;
    } else if (op == 'S') {
      char buf[400];
      uint64_t count, pinned = 0;
      uint64_t resident, puts, gets, dels, rejected, swept, timeouts;
      int active;
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        count = g_store.objects.size();
        for (const auto& kv : g_store.objects) {
          if (kv.second.pins > 0) pinned++;
        }
        resident = g_store.resident_bytes;
        puts = g_store.puts;
        gets = g_store.gets;
        dels = g_store.dels;
        rejected = g_store.rejected;
        swept = g_store.swept;
        timeouts = g_store.timeouts;
      }
      {
        std::lock_guard<std::mutex> lock(g_conn_mu);
        active = g_active_connections;
      }
      int n = std::snprintf(
          buf, sizeof(buf),
          "{\"objects\":%llu,\"resident_bytes\":%llu,\"puts\":%llu,"
          "\"gets\":%llu,\"dels\":%llu,\"rejected\":%llu,"
          "\"pinned\":%llu,\"swept\":%llu,\"timeouts\":%llu,"
          "\"active_connections\":%d,\"max_connections\":%d}",
          (unsigned long long)count, (unsigned long long)resident,
          (unsigned long long)puts, (unsigned long long)gets,
          (unsigned long long)dels, (unsigned long long)rejected,
          (unsigned long long)pinned, (unsigned long long)swept,
          (unsigned long long)timeouts, active, g_max_connections);
      if (!send_response(fd, '0', buf, static_cast<uint64_t>(n))) break;
    } else {
      send_response(fd, '3', nullptr, 0);
      break;
    }
  }
  ::close(fd);
  {
    std::lock_guard<std::mutex> lock(g_conn_mu);
    g_active_connections--;
  }
  g_conn_cv.notify_one();
}

}  // namespace

int main(int argc, char** argv) {
  int port = 38100;
  uint64_t max_bytes = 0;
  const char* env_secret = std::getenv("SPECFORGE_STORE_SECRET");
  if (env_secret) g_store.secret = env_secret;
  for (int i = 1; i < argc; i++) {
    if (!std::strcmp(argv[i], "--port") && i + 1 < argc) {
      port = std::atoi(argv[++i]);
    } else if (!std::strcmp(argv[i], "--max-bytes") && i + 1 < argc) {
      max_bytes = std::strtoull(argv[++i], nullptr, 10);
    } else if (!std::strcmp(argv[i], "--secret") && i + 1 < argc) {
      g_store.secret = argv[++i];
    } else if (!std::strcmp(argv[i], "--max-connections") && i + 1 < argc) {
      g_max_connections = std::atoi(argv[++i]);
    } else if (!std::strcmp(argv[i], "--frame-timeout-seconds") &&
               i + 1 < argc) {
      g_frame_timeout_s = std::atoi(argv[++i]);
    } else {
      std::fprintf(
          stderr,
          "usage: %s [--port N] [--max-bytes N] [--secret S] "
          "[--max-connections N] [--frame-timeout-seconds N]\n",
          argv[0]);
      return 2;
    }
  }
  g_store.max_bytes = max_bytes;
  ::signal(SIGPIPE, SIG_IGN);

  int listener = ::socket(AF_INET, SOCK_STREAM, 0);
  if (listener < 0) {
    std::perror("socket");
    return 1;
  }
  int one = 1;
  ::setsockopt(listener, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::bind(listener, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    std::perror("bind");
    return 1;
  }
  if (::listen(listener, 128) < 0) {
    std::perror("listen");
    return 1;
  }
  std::printf(
      "feature_store_server listening on port %d (max_bytes=%llu, auth=%s)\n",
      port, (unsigned long long)max_bytes,
      g_store.secret.empty() ? "off" : "on");
  std::fflush(stdout);

  for (;;) {
    if (g_max_connections > 0) {
      // accept backpressure: block until a slot frees; queued peers wait
      // in the kernel backlog instead of spawning unbounded threads
      std::unique_lock<std::mutex> lock(g_conn_mu);
      g_conn_cv.wait(lock, [] {
        return g_active_connections < g_max_connections;
      });
    }
    int fd = ::accept(listener, nullptr, nullptr);
    if (fd < 0) {
      if (errno == EINTR) continue;
      std::perror("accept");
      break;
    }
    {
      std::lock_guard<std::mutex> lock(g_conn_mu);
      g_active_connections++;
    }
    std::thread(handle_connection, fd).detach();
  }
  return 0;
}
