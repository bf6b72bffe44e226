// Minimal glog shim for building the reference without glog.
#pragma once
#include <cstdlib>
#include <iostream>
#include <sstream>
namespace google {
inline void InitGoogleLogging(const char*) {}
inline void InstallFailureSignalHandler() {}
}
class _ShimLogMsg {
 public:
  explicit _ShimLogMsg(bool fatal) : fatal_(fatal) {}
  ~_ShimLogMsg() {
    std::cerr << ss_.str() << std::endl;
    if (fatal_) std::abort();
  }
  template <typename T>
  _ShimLogMsg& operator<<(const T& v) { ss_ << v; return *this; }
 private:
  std::ostringstream ss_;
  bool fatal_;
};
#define LOG(severity) _SHIM_LOG_##severity
#define _SHIM_LOG_INFO _ShimLogMsg(false)
#define _SHIM_LOG_WARNING _ShimLogMsg(false)
#define _SHIM_LOG_ERROR _ShimLogMsg(false)
#define _SHIM_LOG_FATAL _ShimLogMsg(true)
#define CHECK(cond) if (cond) {} else _ShimLogMsg(true) << "CHECK failed: " #cond " "
#define CHECK_EQ(a, b) CHECK((a) == (b))
#define CHECK_NE(a, b) CHECK((a) != (b))
#define CHECK_GE(a, b) CHECK((a) >= (b))
#define CHECK_GT(a, b) CHECK((a) > (b))
#define CHECK_LE(a, b) CHECK((a) <= (b))
#define CHECK_LT(a, b) CHECK((a) < (b))
#define CHECK_NOTNULL(p) (p)
#define DCHECK(cond) CHECK(cond)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define VLOG(n) _ShimLogMsg(false)
// glog flag the reference's InitApp sets.
static bool FLAGS_logtostderr = false;
