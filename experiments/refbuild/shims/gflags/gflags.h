// Minimal gflags shim.
#pragma once
#include <string>
#define DEFINE_string(name, val, txt) std::string FLAGS_##name = val;
#define DEFINE_int32(name, val, txt) int FLAGS_##name = val;
#define DEFINE_int64(name, val, txt) long long FLAGS_##name = val;
#define DEFINE_double(name, val, txt) double FLAGS_##name = val;
#define DEFINE_bool(name, val, txt) bool FLAGS_##name = val;
#define DECLARE_string(name) extern std::string FLAGS_##name;
#define DECLARE_int32(name) extern int FLAGS_##name;
#define DECLARE_double(name) extern double FLAGS_##name;
#define DECLARE_bool(name) extern bool FLAGS_##name;
namespace google {
inline void ParseCommandLineFlags(int*, char***, bool) {}
inline void SetUsageMessage(const std::string&) {}
inline void SetVersionString(const std::string&) {}
}
namespace gflags = google;
