// Ceres solve oracle: feed a recorded motionOnlyBA problem instance
// (written by tools/dump_ba_problem.py) to the REFERENCE's own cost
// functions (include/cfsd/cost-functions.hpp) and the REAL vendored
// Ceres 1.14, with the reference's exact problem construction and solver
// options (src/optimizer.cpp:16-161).  Prints the solution deltas and
// solve stats in machine-parsable lines; benchmarks/ceres_oracle.py diffs
// them against our backend/lm.py solution of the same instance.
//
// Build (after tools/build_reference.sh):
//   g++ -O2 -std=c++14 -DEUROC tools/ceres_oracle.cpp \
//       $WORK/ref/src/config.cpp $WORK/ref/src/map.cpp \
//       -I$WORK/ref/include -I$WORK/ref/thirdparty/Sophus-1.0.0 \
//       -I$TF_EIGEN -I/usr/include/opencv4 -I$WORK/ceres-install/include \
//       -L$WORK/ceres-install/lib -lceres \
//       -lopencv_core -lopencv_calib3d -lopencv_imgproc -pthread \
//       -o $WORK/ceres_oracle
//
// Usage: ceres_oracle <euroc_sim.yml> <ba_problem.txt>
//        ORACLE_INIT=1 ceres_oracle ...   -> solve the four initial*
//        problems (optimizer.cpp:183-329) on the recorded chain instead

#include "cfsd/config.hpp"
#include "cfsd/camera-model.hpp"
#include "cfsd/map.hpp"
#include "cfsd/cost-functions.hpp"

#include <fstream>
#include <sstream>
#include <iostream>
#include <unordered_map>

using cfsd::Map;
using cfsd::MapPoint;
using cfsd::ImuConstraint;

static std::vector<double> nums(std::istringstream& ss, int n) {
    std::vector<double> v(n);
    for (int i = 0; i < n; i++) ss >> v[i];
    return v;
}

int main(int argc, char** argv) {
    if (argc != 3) {
        std::cerr << "usage: ceres_oracle <config.yml> <problem.txt>\n";
        return 1;
    }
    cfsd::Config::setParameterFile(argv[1]);
    auto pCam = std::make_shared<cfsd::CameraModel>();
    auto pMap = std::make_shared<Map>(pCam, false);

    std::ifstream f(argv[2]);
    if (!f.is_open()) { std::cerr << "no problem file\n"; return 1; }

    double priorFactor = 0;
    int W = 0;
    std::vector<std::array<double, 16>> frames;
    struct Obs { int slot; size_t id; double px, py, X, Y, Z; };
    std::vector<Obs> obsv;
    std::string line, tag;
    std::vector<std::vector<double>> icRaw;
    Eigen::Vector3d gravity;
    double fx = 0, fy = 0, cx = 0, cy = 0, isx = 0, isy = 0;
    while (std::getline(f, line)) {
        std::istringstream ss(line);
        ss >> tag;
        if (tag == "gravity") { auto v = nums(ss, 3); gravity << v[0], v[1], v[2]; }
        else if (tag == "prior_factor") ss >> priorFactor;
        else if (tag == "calib") { ss >> fx >> fy >> cx >> cy >> isx >> isy; }
        else if (tag == "W") ss >> W;
        else if (tag == "frame") {
            auto v = nums(ss, 16);
            std::array<double, 16> a{};
            std::copy(v.begin(), v.end(), a.begin());
            frames.push_back(a);
        } else if (tag == "ic") icRaw.push_back(nums(ss, 3 + 3 + 1 + 4 + 3 + 3 + 45 + 225));
        else if (tag == "obs") {
            Obs o; ss >> o.slot >> o.id >> o.px >> o.py >> o.X >> o.Y >> o.Z;
            obsv.push_back(o);
        }
    }

    // Populate the reference Map exactly as its pipeline would hold this
    // window: _R[0..W] with _imuConstraint[0..W-1] (prior on index 0).
    pMap->_R.clear(); pMap->_v.clear(); pMap->_p.clear();
    pMap->_dbg.clear(); pMap->_dba.clear(); pMap->_frames.clear();
    pMap->_gravity = gravity;
    for (const auto& a : frames) {
        Eigen::Quaterniond q(a[0], a[1], a[2], a[3]);
        pMap->_R.push_back(Sophus::SO3d(q));
        pMap->_v.push_back(Eigen::Vector3d(a[4], a[5], a[6]));
        pMap->_p.push_back(Eigen::Vector3d(a[7], a[8], a[9]));
        pMap->_dbg.push_back(Eigen::Vector3d(a[10], a[11], a[12]));
        pMap->_dba.push_back(Eigen::Vector3d(a[13], a[14], a[15]));
        pMap->_frames.push_back({});
        pMap->_timestamp.push_back(0);
    }
    for (const auto& v : icRaw) {
        int o = 0;
        auto vec3 = [&](int at) { return Eigen::Vector3d(v[at], v[at+1], v[at+2]); };
        auto mat3 = [&](int at) {
            Eigen::Matrix3d m;
            for (int r = 0; r < 3; r++) for (int c = 0; c < 3; c++) m(r, c) = v[at + 3*r + c];
            return m;
        };
        Eigen::Vector3d bg = vec3(o); o += 3;
        Eigen::Vector3d ba = vec3(o); o += 3;
        double dt = v[o]; o += 1;
        Eigen::Quaterniond q(v[o], v[o+1], v[o+2], v[o+3]); o += 4;
        Eigen::Vector3d dv = vec3(o); o += 3;
        Eigen::Vector3d dp = vec3(o); o += 3;
        Eigen::Matrix3d dRbg = mat3(o); o += 9;
        Eigen::Matrix3d dvbg = mat3(o); o += 9;
        Eigen::Matrix3d dvba = mat3(o); o += 9;
        Eigen::Matrix3d dpbg = mat3(o); o += 9;
        Eigen::Matrix3d dpba = mat3(o); o += 9;
        Eigen::Matrix<double, 15, 15> ic;
        for (int r = 0; r < 15; r++) for (int c = 0; c < 15; c++) ic(r, c) = v[o + 15*r + c];
        pMap->_imuConstraint.push_back(std::make_shared<ImuConstraint>(
            ic, bg, ba, Sophus::SO3d(q), dv, dp, dRbg, dvbg, dvba, dpbg, dpba, dt));
    }
    for (const auto& o : obsv)
        pMap->_frames[o.slot].push_back(std::make_shared<MapPoint>(
            o.id, cv::Point2d(o.px, o.py), Eigen::Vector3d(o.X, o.Y, o.Z)));

    // ---- init-solver oracle mode (optimizer.cpp:183-329) --------------
    // Chain = active frames 1..W with constraints ics[1..W-1] (reference
    // initial* solvers run over _R[0..W-1] + _imuConstraint[0..W-2]).
    if (getenv("ORACLE_INIT")) {
        int W2 = (int)pMap->_R.size() - 1;
        std::vector<Sophus::SO3d> Rv;
        std::vector<Eigen::Vector3d> pv, vv(W2, Eigen::Vector3d::Zero());
        std::vector<cfsd::Ptr<ImuConstraint>> icv;
        for (int i = 1; i <= W2; i++) { Rv.push_back(pMap->_R[i]); pv.push_back(pMap->_p[i]); }
        for (int i = 1; i < W2; i++) icv.push_back(pMap->_imuConstraint[i]);
        ceres::Solver::Options opt;
        opt.linear_solver_type = ceres::DENSE_QR;
        ceres::Solver::Summary sm;
        std::cout.precision(17);
        // 1. gyr bias (initialGyrBias, optimizer.cpp:183-206)
        double dbg[3] = {0, 0, 0};
        {
            ceres::Problem pr;
            for (int i = 0; i + 1 < W2; i++)
                pr.AddResidualBlock(new cfsd::BiasGyrCostFunction(icv[i], Rv[i], Rv[i+1]),
                                    new ceres::HuberLoss(1.0), dbg);
            ceres::Solve(opt, &pr, &sm);
        }
        std::cout << "ORACLE_INIT dbg " << dbg[0] << " " << dbg[1] << " " << dbg[2] << std::endl;
        Eigen::Vector3d dbg_v(dbg[0], dbg[1], dbg[2]);
        // Map::repropagate (map.cpp:72-81) on the local chain
        for (auto& ic : icv) {
            Eigen::Vector3d zero = Eigen::Vector3d::Zero();
            ic = std::make_shared<ImuConstraint>(
                ic->invCovPreintegration_ij, ic->bg_i + dbg_v, ic->ba_i,
                ic->delta_R_ij * Sophus::SO3d::exp(ic->d_R_bg_ij * dbg_v),
                ic->delta_v_ij + ic->d_v_bg_ij * dbg_v,
                ic->delta_p_ij + ic->d_p_bg_ij * dbg_v,
                ic->d_R_bg_ij, ic->d_v_bg_ij, ic->d_v_ba_ij,
                ic->d_p_bg_ij, ic->d_p_ba_ij, ic->dt);
        }
        // 2. gravity + velocities (initialGravityVelocity, :209-240)
        double dg[3] = {0, 0, 0};
        std::vector<std::array<double, 3>> dv(W2, {0, 0, 0});
        {
            ceres::Problem pr;
            for (int i = 0; i + 1 < W2; i++)
                pr.AddResidualBlock(new cfsd::GravityVelocityCostFunction(icv[i], Rv[i], pv[i], pv[i+1]),
                                    new ceres::HuberLoss(1.0),
                                    dg, dv[i].data(), dv[i+1].data());
            ceres::Solve(opt, &pr, &sm);
        }
        std::cout << "ORACLE_INIT g " << dg[0] << " " << dg[1] << " " << dg[2] << std::endl;
        for (int i = 0; i < W2; i++)
            std::cout << "ORACLE_INIT v " << i << " " << dv[i][0] << " " << dv[i][1] << " " << dv[i][2] << std::endl;
        Eigen::Vector3d g_est(dg[0], dg[1], dg[2]);
        for (int i = 0; i < W2; i++) vv[i] = Eigen::Vector3d(dv[i][0], dv[i][1], dv[i][2]);
        // 3. alignment (initialAlignment, :243-304; EUROC rotvec = (0, r0, r1))
        double dr[2] = {0, 0};
        {
            ceres::Problem pr;
            pr.AddResidualBlock(new cfsd::AlignmentCostFunction(g_est / g_est.norm(), gravity / gravity.norm()),
                                nullptr, dr);
            ceres::Solve(opt, &pr, &sm);
        }
        std::cout << "ORACLE_INIT delta_r " << dr[0] << " " << dr[1] << std::endl;
        Sophus::SO3d dRw = Sophus::SO3d::exp(Eigen::Vector3d(0.0, dr[0], dr[1]));
        for (int i = 0; i < W2; i++) {
            Rv[i] = dRw * Rv[i];
            vv[i] = dRw.matrix() * vv[i];
            pv[i] = dRw.matrix() * pv[i];
        }
        // 4. acc bias (initialAccBias, :307-329 — NOTE: the reference
        // passes the preintegrator's LAST constraint `_ic` for every pair,
        // an evident indexing slip; per-pair icv[i] is used here, matching
        // the loop intent and our solver)
        double dba[3] = {0, 0, 0};
        {
            ceres::Problem pr;
            for (int i = 0; i + 1 < W2; i++)
                pr.AddResidualBlock(new cfsd::AccCostFunction(icv[i], Rv[i], vv[i], vv[i+1], pv[i], pv[i+1], gravity),
                                    new ceres::HuberLoss(1.0), dba);
            ceres::Solve(opt, &pr, &sm);
        }
        std::cout << "ORACLE_INIT dba " << dba[0] << " " << dba[1] << " " << dba[2] << std::endl;
        return 0;
    }

    // ---- the reference's motionOnlyBA construction (optimizer.cpp:16-161)
    const int WINDOW = W;
    std::vector<std::vector<double>> delta_pose(WINDOW, std::vector<double>(6, 0));
    std::vector<std::vector<double>> delta_v_dbga(WINDOW, std::vector<double>(9, 0));
    int actualSize = WINDOW;
    int n = (int)pMap->_frames.size() - actualSize;  // = 1

    ceres::Problem problem;
    ceres::LossFunction* lossFunction = new ceres::HuberLoss(1.0);
    problem.AddResidualBlock(
        new cfsd::PriorCostFunction(pMap, n - 1, priorFactor), NULL,
        delta_pose[0].data(), delta_v_dbga[0].data());
    for (int i = 0; i < actualSize - 1; i++)
        problem.AddResidualBlock(
            new cfsd::ImuCostFunction(pMap, n + i), NULL,
            delta_pose[i].data(), delta_v_dbga[i].data(),
            delta_pose[i + 1].data(), delta_v_dbga[i + 1].data());

    // sanity check: the reference uses _K_L for reprojection (optimizer
    // ctor); on the rendered sim world it must equal the dumped rectified
    // calibration or the two stacks are not solving the same problem.
    double rfx = pCam->_K_L.at<double>(0, 0), rcx = pCam->_K_L.at<double>(0, 2);
    if (std::abs(rfx - fx) > 1e-6 || std::abs(rcx - cx) > 1e-6)
        std::cerr << "CALIB MISMATCH ref(" << rfx << "," << rcx << ") vs dump("
                  << fx << "," << cx << ")\n";
    Eigen::Matrix2d invStdT; invStdT << isx, 0, 0, isy;

    std::unordered_map<size_t, std::vector<std::pair<int, int>>> landmarks;
    for (int i = 0; i < actualSize; i++)
        for (size_t j = 0; j < pMap->_frames[n + i].size(); j++)
            landmarks[pMap->_frames[n + i][j]->id].push_back({n + i, (int)j});

    int nblocks = 0;
    for (const auto& l : landmarks) {
        std::vector<double*> delta_pose_img;
        std::unordered_map<int, int> seen;
        int errorTerms = 0;
        for (const auto& pr : l.second)
            if (!seen.count(pr.first)) {
                delta_pose_img.push_back(delta_pose[pr.first - n].data());
                seen[pr.first] = 1;
                errorTerms++;
            }
        if (errorTerms < 2) continue;
        Eigen::VectorXd error(2 * errorTerms);
        Eigen::MatrixXd F(2 * errorTerms, 6 * errorTerms);
        F.setZero();
        int j = 0;
        for (const auto& pr : l.second) {
            if (seen[pr.first] == 0) continue;
            seen[pr.first] = 0;
            const auto& mp = pMap->_frames[pr.first][pr.second];
            Eigen::Vector3d temp = pMap->_R[pr.first].inverse() * (mp->position - pMap->_p[pr.first]);
            Eigen::Vector3d pc = pCam->_T_CB * temp;
            double x = pc.x(), y = pc.y(), z = pc.z();
            Eigen::Matrix<double, 2, 3> de;
            de << fx / z, 0, -fx * x / (z * z), 0, fy / z, -fy * y / (z * z);
            error(2 * j) = invStdT(0, 0) * (fx * x / z + cx - mp->pixel.x);
            error(2 * j + 1) = invStdT(1, 1) * (fy * y / z + cy - mp->pixel.y);
            F.block<2, 3>(2 * j, 6 * j + 3) = -invStdT * de * pCam->_T_CB.so3().matrix();
            F.block<2, 3>(2 * j, 6 * j) = -F.block<2, 3>(2 * j, 6 * j + 3) * Sophus::SO3d::hat(temp);
            j++;
        }
        problem.AddResidualBlock(
            new cfsd::ImageCostFunction(errorTerms, error, F), lossFunction,
            delta_pose_img);
        nblocks++;
    }

    ceres::Solver::Options options;
    options.linear_solver_type = ceres::DENSE_SCHUR;
    options.minimizer_progress_to_stdout = true;
    options.max_num_iterations = cfsd::Config::get<int>("max_num_iterations");
    options.max_solver_time_in_seconds = cfsd::Config::get<double>("max_solver_time_in_seconds");
    options.num_threads = cfsd::Config::get<int>("num_threads");
    ceres::Solver::Summary summary;
    ceres::Solve(options, &problem, &summary);
    std::cout << summary.FullReport() << std::endl;

    std::cout.precision(17);
    std::cout << "ORACLE nlandmarks " << nblocks << std::endl;
    std::cout << "ORACLE iterations " << summary.iterations.size() - 1 << std::endl;
    std::cout << "ORACLE initial_cost " << summary.initial_cost << std::endl;
    std::cout << "ORACLE final_cost " << summary.final_cost << std::endl;
    for (int i = 0; i < WINDOW; i++) {
        std::cout << "ORACLE delta_pose " << i;
        for (int k = 0; k < 6; k++) std::cout << " " << delta_pose[i][k];
        std::cout << std::endl;
        std::cout << "ORACLE delta_v_dbga " << i;
        for (int k = 0; k < 9; k++) std::cout << " " << delta_v_dbga[i][k];
        std::cout << std::endl;
    }
    return 0;
}
