// specforge-tpu network feature store server.
//
// The cross-host tensor plane for disaggregated training — the TPU-native
// replacement for the reference's Mooncake RDMA object store (SURVEY §2.9 #8):
// a host-RAM object store with a length-prefixed binary protocol over TCP/DCN.
// Producer hosts PUT raw tensor buffers (shape/dtype ride in the SampleRef
// metadata, never serialized blobs); trainer hosts GET into preallocated
// buffers and DEL at the optimizer-durable ack. Lifetime semantics match the
// reference store contract: objects are hard-pinned (the trainer is the
// lifetime authority, no LRU), and puts above the byte budget are refused
// loudly so producer flow control is the graceful path.
//
// Protocol (all integers little-endian):
//   request:  op:u8  key_len:u32  key[key_len]  payload_len:u64  payload
//     op 'P' = put (payload = object bytes)
//     op 'G' = get (payload empty)
//     op 'D' = del (payload empty)
//     op 'S' = stat (payload empty; response = JSON counters)
//     op 'Q' = quit connection
//   response: status:u8 ('0' ok, '1' missing, '2' over-budget, '3' error)
//             payload_len:u64  payload
//
// Build: make -C cpp   (g++ -O2 -pthread, no external deps)

#include <arpa/inet.h>
#include <cerrno>
#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <string>
#include <sys/socket.h>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct Store {
  std::mutex mu;
  std::unordered_map<std::string, std::vector<uint8_t>> objects;
  uint64_t resident_bytes = 0;
  uint64_t max_bytes = 0;  // 0 = unlimited
  uint64_t puts = 0, gets = 0, dels = 0, rejected = 0;
};

Store g_store;

bool read_exact(int fd, void* buf, size_t n) {
  auto* p = static_cast<uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::recv(fd, p, n, 0);
    if (r <= 0) {
      if (r < 0 && (errno == EINTR)) continue;
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
      return false;
    }
    p += r;
    n -= static_cast<size_t>(r);
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
  for (;;) {
    uint8_t op;
    if (!read_exact(fd, &op, 1)) break;
    if (op == 'Q') break;
    uint32_t key_len = 0;
    if (!read_exact(fd, &key_len, 4)) break;
    if (key_len > (1u << 20)) break;  // absurd key: protocol desync
    std::string key(key_len, '\0');
    if (key_len && !read_exact(fd, key.data(), key_len)) break;
    uint64_t payload_len = 0;
    if (!read_exact(fd, &payload_len, 8)) break;

    if (op == 'P') {
      std::vector<uint8_t> payload(payload_len);
      if (payload_len && !read_exact(fd, payload.data(), payload_len)) break;
      char status = '0';
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        auto it = g_store.objects.find(key);
        uint64_t existing = it == g_store.objects.end() ? 0 : it->second.size();
        uint64_t next = g_store.resident_bytes - existing + payload_len;
        if (g_store.max_bytes != 0 && next > g_store.max_bytes) {
          status = '2';
          g_store.rejected++;
        } else {
          g_store.resident_bytes = next;
          g_store.objects[key] = std::move(payload);
          g_store.puts++;
        }
      }
      if (!send_response(fd, status, nullptr, 0)) break;
    } else if (op == 'G') {
      // Copy under the lock (objects are MBs; holding the lock across the
      // socket write would serialize every reader — the reference documents
      // the same no-lock-across-RPC rule, mooncake_store.py:47-55).
      std::vector<uint8_t> copy;
      bool found = false;
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        auto it = g_store.objects.find(key);
        if (it != g_store.objects.end()) {
          copy = it->second;
          found = true;
          g_store.gets++;
        }
      }
      if (found) {
        if (!send_response(fd, '0', copy.data(), copy.size())) break;
      } else {
        if (!send_response(fd, '1', nullptr, 0)) break;
      }
    } else if (op == 'D') {
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        auto it = g_store.objects.find(key);
        if (it != g_store.objects.end()) {
          g_store.resident_bytes -= it->second.size();
          g_store.objects.erase(it);
          g_store.dels++;
        }
      }
      if (!send_response(fd, '0', nullptr, 0)) break;
    } else if (op == 'S') {
      char buf[256];
      uint64_t count;
      uint64_t resident, puts, gets, dels, rejected;
      {
        std::lock_guard<std::mutex> lock(g_store.mu);
        count = g_store.objects.size();
        resident = g_store.resident_bytes;
        puts = g_store.puts;
        gets = g_store.gets;
        dels = g_store.dels;
        rejected = g_store.rejected;
      }
      int n = std::snprintf(
          buf, sizeof(buf),
          "{\"objects\":%llu,\"resident_bytes\":%llu,\"puts\":%llu,"
          "\"gets\":%llu,\"dels\":%llu,\"rejected\":%llu}",
          (unsigned long long)count, (unsigned long long)resident,
          (unsigned long long)puts, (unsigned long long)gets,
          (unsigned long long)dels, (unsigned long long)rejected);
      if (!send_response(fd, '0', buf, static_cast<uint64_t>(n))) break;
    } else {
      send_response(fd, '3', nullptr, 0);
      break;
    }
  }
  ::close(fd);
}

}  // namespace

int main(int argc, char** argv) {
  int port = 38100;
  uint64_t max_bytes = 0;
  for (int i = 1; i < argc; i++) {
    if (!std::strcmp(argv[i], "--port") && i + 1 < argc) {
      port = std::atoi(argv[++i]);
    } else if (!std::strcmp(argv[i], "--max-bytes") && i + 1 < argc) {
      max_bytes = std::strtoull(argv[++i], nullptr, 10);
    } else {
      std::fprintf(stderr,
                   "usage: %s [--port N] [--max-bytes N]\n", argv[0]);
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
  std::printf("feature_store_server listening on port %d (max_bytes=%llu)\n",
              port, (unsigned long long)max_bytes);
  std::fflush(stdout);

  for (;;) {
    int fd = ::accept(listener, nullptr, nullptr);
    if (fd < 0) {
      if (errno == EINTR) continue;
      std::perror("accept");
      break;
    }
    std::thread(handle_connection, fd).detach();
  }
  return 0;
}
